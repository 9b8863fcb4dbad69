from tpu3dsis.parallel.spatial import halo_exchange, spatial_features

__all__ = ["halo_exchange", "spatial_features"]
