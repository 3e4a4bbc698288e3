"""Run state: lineage manifests, checkpoint/resume."""
