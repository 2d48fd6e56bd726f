"""Column-level function library (built-in expressions only — JVM-side,
whole-stage-codegen friendly; no Python row UDFs)."""
