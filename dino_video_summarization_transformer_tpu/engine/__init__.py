from .scoring import FRAME_BUFFER, FrameScorer, export_loss, run_scoring

__all__ = ["FRAME_BUFFER", "FrameScorer", "export_loss", "run_scoring"]
