"""Monodromy-polytope coverage engine.

Host-side exact rational geometry (replacing the external ``monodromy``
package and its lrs/cdd C backends) + device-side batched membership.
"""
