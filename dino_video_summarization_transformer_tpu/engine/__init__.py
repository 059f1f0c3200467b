from .scoring import FrameScorer, ScorerConfig, export_loss, run_scoring

__all__ = ["FrameScorer", "ScorerConfig", "export_loss", "run_scoring"]
