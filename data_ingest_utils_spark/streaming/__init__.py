"""Event-time transforms shared by batch and streaming execution."""
