"""tfmq_dm_tpu.parallel"""
