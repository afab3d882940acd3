from maskedsst_tpu.models.vit_spatial_spectral import ViTSpatialSpectral  # noqa: F401
from maskedsst_tpu.models.vit_spatial_spectral_v1 import ViTSpatialSpectralV1  # noqa: F401
from maskedsst_tpu.models.vit_rgb import ViTRGB  # noqa: F401
from maskedsst_tpu.models.simmim import SimMIM, SimMIMSpatialSpectral  # noqa: F401
