from .pallas_cloudsc import cloudsc_pallas, pallas_supported

__all__ = ["cloudsc_pallas", "pallas_supported"]
