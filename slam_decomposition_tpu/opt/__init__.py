"""Differentiable cost functions, device-resident multi-start optimization,
and target samplers."""
