"""Shared mutable engine state: cuckoo-filter seen set, token buckets, checkpoints."""
