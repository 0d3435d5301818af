"""Core TPU math: complex-pair linear algebra, Jacobi eigensolvers, Weyl/
Makhlin invariants, KAK decomposition, matrix exponentials."""
