"""Circuit IR, 2Q-block consolidation, analytic decomposition passes, and
speed-limit-aware transpilation."""
