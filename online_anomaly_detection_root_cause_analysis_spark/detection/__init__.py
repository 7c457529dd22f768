from .pipeline import ThresholdPipelineResult, run_threshold_pipeline

__all__ = ["ThresholdPipelineResult", "run_threshold_pipeline"]
