"""Run state: local union-find, run manifests / checkpoints."""
