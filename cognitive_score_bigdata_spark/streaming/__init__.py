"""Structured Streaming rebuild of the reference hot path
(ingestion Lambda → Kinesis → stream-processor Lambda → DynamoDB)."""
