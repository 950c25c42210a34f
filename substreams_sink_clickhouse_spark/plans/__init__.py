"""Physical-plan inspection and assertions."""
