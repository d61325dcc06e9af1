"""Plan-level building blocks: id assignment, skew handling, pruning."""
