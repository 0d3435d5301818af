"""Gate zoo, Hamiltonian models, and variational templates."""
