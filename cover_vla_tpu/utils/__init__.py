from cover_vla_tpu.utils.tree import count_params, cast_tree, param_bytes


def get_class_from_path(dotted: str):
    """'pkg.module.ClassName' -> class object (INT-ACT
    src/utils/pipeline.py:24-32; used for config-driven adapter/evaluator
    selection)."""
    import importlib
    module_path, name = dotted.rsplit(".", 1)
    return getattr(importlib.import_module(module_path), name)
