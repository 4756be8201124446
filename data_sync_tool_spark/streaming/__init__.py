from .cdc import CdcPipeline, CdcMetrics  # noqa: F401
