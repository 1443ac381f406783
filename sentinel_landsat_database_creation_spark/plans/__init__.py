"""Multi-stage pipelines and the driver-contract query registry."""
