from tpu3dsis.infer.tiling import SceneInference, tile_origins

__all__ = ["SceneInference", "tile_origins"]
