from maskedsst_tpu.models.vit_spatial_spectral import ViTSpatialSpectral  # noqa: F401
from maskedsst_tpu.models.vit_rgb import ViTRGB  # noqa: F401
from maskedsst_tpu.models.simmim import SimMIMSpatialSpectral  # noqa: F401
