"""drivescenegen_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of DriveSceneGen.

Two-stage driving-scenario generation:

1. Generation: Waymo Open Motion TFRecords -> map/agent tensors -> analytic
   BEV rasterization -> DDPM UNet2D training -> DDPM/DDIM sampling.
2. Vectorization: generated rasters -> skeleton -> directed lane graph with
   spline/Bezier centerlines -> agent box decoding -> HDMapGen-style metrics.

Public API mirrors the reference's five CLI stages
(reference: /root/reference README.md:38-70):
    data_preprocess -> data_rasterization -> train -> generation -> vectorization
plus compute_map_metrics.
"""

__version__ = "0.1.0"
