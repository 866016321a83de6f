"""tfmq_dm_tpu.quant"""
