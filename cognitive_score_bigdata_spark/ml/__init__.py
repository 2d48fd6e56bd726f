"""MLlib scoring pipeline (reference serving path, SURVEY §3.2)."""
