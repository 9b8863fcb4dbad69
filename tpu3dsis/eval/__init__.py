from tpu3dsis.eval.detection_map import APAccumulator, DetectionMAP

__all__ = ["APAccumulator", "DetectionMAP"]
