"""Multimodal columns: opaque binary payloads + typed metadata."""
