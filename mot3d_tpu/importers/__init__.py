from mot3d_tpu.importers.torch_ckpt import (  # noqa: F401
    import_detectron2_maskrcnn, import_tracking_modules, load_torch_state_dict)
