"""Ray Data stages: each is a map_batches transform or an explicitly
keyed partition-wise shuffle (see shuffle.py for the pattern)."""
