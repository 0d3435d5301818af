"""Configuration layer.

The reference had a single hardcoded ``srcpath`` (config.py:3) plus scattered
module constants (optimizer.py:18-19). Here everything is gathered into one
dataclass with environment-variable overrides.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib


def _env_float(name: str, default: float) -> float:
    v = os.environ.get(name)
    return float(v) if v is not None else default


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v is not None else default


@dataclasses.dataclass
class Config:
    """Global knobs. Reference counterparts cited per field."""

    # success threshold for variational synthesis (optimizer.py:18)
    success_threshold: float = _env_float("SLAM_SUCCESS_THRESHOLD", 1e-10)
    # multi-start restarts (optimizer.py:19)
    training_restarts: int = _env_int("SLAM_TRAINING_RESTARTS", 5)
    # maximum L-BFGS iterations per restart (optimizer.py:270 maxiter=2500)
    max_opt_iters: int = _env_int("SLAM_MAX_OPT_ITERS", 400)
    # data/cache directory (reference config.py:3 srcpath)
    data_dir: pathlib.Path = pathlib.Path(
        os.environ.get("SLAM_DATA_DIR", str(pathlib.Path(__file__).parent / "data"))
    )
    # enable float64 (TPU emulates f64; required to certify 1e-10 losses)
    enable_x64: bool = os.environ.get("SLAM_ENABLE_X64", "1") == "1"

    def cache_path(self, name: str) -> pathlib.Path:
        self.data_dir.mkdir(parents=True, exist_ok=True)
        return self.data_dir / name


config = Config()


def setup_x64() -> None:
    import jax

    if config.enable_x64:
        jax.config.update("jax_enable_x64", True)
    # TPU f32 matmuls default to bf16 MXU passes (~3 significant digits),
    # which stalls the f32 optimization phases at ~1e-3; force the 3-pass
    # full-f32 algorithm
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compilation cache: remote AOT compiles through the axon
    # tunnel cost minutes per executable; every entry point (scripts,
    # examples, bench) should share the repo-local cache. bench.py sets
    # this itself; scripts going through setup_x64 previously paid full
    # recompiles on every run. SLAM_JAX_CACHE= (empty) disables.
    cache_dir = os.environ.get(
        "SLAM_JAX_CACHE",
        str(pathlib.Path(__file__).parent.parent / ".jax_cache"),
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
