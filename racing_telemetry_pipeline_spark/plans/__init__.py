from .pipeline import run_pipeline, PipelineResult

__all__ = ["run_pipeline", "PipelineResult"]
