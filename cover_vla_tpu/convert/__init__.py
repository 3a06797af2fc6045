from cover_vla_tpu.convert import checkpoints
