from maskedsst_tpu.io.torch_import import (  # noqa: F401
    import_vit_spatial_spectral,
    import_simmim,
    import_vit_rgb,
    load_pretrained_encoder,
)
