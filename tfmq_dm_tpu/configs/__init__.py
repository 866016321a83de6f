"""tfmq_dm_tpu.configs"""
