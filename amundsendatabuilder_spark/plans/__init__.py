"""Composed multi-operator plans: the flagship search-document builds,
staleness sweep, publish stamping, and the oracle-verified query suite."""
