"""Host-side pipeline stages (label engineering, tilesets, aggregation,
metrics) mirroring the reference's script-level workflows while the device
compute path lives in ``roadsurf_tpu.models`` / ``roadsurf_tpu.engine``."""
