"""tfmq_dm_tpu.samplers"""
