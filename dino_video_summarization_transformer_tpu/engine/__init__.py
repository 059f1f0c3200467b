from .scoring import FrameScorer, export_loss, pick_bucket, run_scoring

__all__ = ["FrameScorer", "export_loss", "pick_bucket", "run_scoring"]
