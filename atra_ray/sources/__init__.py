"""Readers and the deterministic fixture generator (no network, no external
data — every byte is a pure function of (seed=42, sf))."""
