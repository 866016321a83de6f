"""tfmq_dm_tpu.models"""
