"""tfmq_dm_tpu.data"""
