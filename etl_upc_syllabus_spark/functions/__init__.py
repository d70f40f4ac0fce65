from .text import bullet_split, chunk_starts, normalize_ws

__all__ = ["bullet_split", "chunk_starts", "normalize_ws"]
