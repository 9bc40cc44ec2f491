"""Structured Streaming operators (stream-static spatial join, windowed
tile rollups)."""
