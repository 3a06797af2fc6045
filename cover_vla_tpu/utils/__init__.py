from cover_vla_tpu.utils.tree import count_params, cast_tree, param_bytes
