"""tfmq_dm_tpu.utils"""
