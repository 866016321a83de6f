"""tfmq_dm_tpu.ops"""
