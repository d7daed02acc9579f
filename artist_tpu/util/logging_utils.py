"""Logging configuration and runtime tracking.

TPU-native equivalent of the reference's colorlog setup and ``track_runtime``
decorator (reference: artist/util/__init__.py:84-210): plain stdlib logging
(per-process prefix instead of per-torch-rank), plus a lightweight runtime
logger that appends start/finish/duration records to ``runtime_log.txt`` and
optionally wraps phases in ``jax.profiler`` trace annotations.
"""

from __future__ import annotations

import contextlib
import functools
import logging
import time
from pathlib import Path
from typing import Any, Callable, TypeVar

F = TypeVar("F", bound=Callable[..., Any])

runtime_log = logging.getLogger("artist_tpu.runtime")
"""Dedicated logger for runtime-tracking records."""

_RUNTIME_HANDLER_SET = False


def set_logger_config(
    level: int = logging.INFO,
    log_file: str | Path | None = None,
    log_to_stderr: bool = True,
    process_index: int | None = None,
) -> None:
    """Configure the ``artist_tpu`` logger hierarchy.

    Parameters
    ----------
    level : int
        Log level (default logging.INFO).
    log_file : str | Path | None
        Optional file to additionally log to.
    log_to_stderr : bool
        Whether to attach a stream handler.
    process_index : int | None
        Multi-host process index included in the log format. If None it is
        read from ``jax.process_index()`` lazily when available.
    """
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0

    base_logger = logging.getLogger("artist_tpu")
    base_logger.setLevel(level)
    base_logger.handlers.clear()

    formatter = logging.Formatter(
        fmt=f"[%(asctime)s][p{process_index}][%(name)s][%(levelname)s] %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    if log_to_stderr:
        handler = logging.StreamHandler()
        handler.setFormatter(formatter)
        base_logger.addHandler(handler)
    if log_file is not None:
        file_handler = logging.FileHandler(str(log_file))
        file_handler.setFormatter(formatter)
        base_logger.addHandler(file_handler)
    base_logger.propagate = False


def set_runtime_logger(
    path: str | Path = "runtime_log.txt", level: int = logging.INFO
) -> None:
    """Attach a file handler to the runtime logger.

    reference: artist/util/__init__.py:141-210 (runtime tracker writing
    runtime_log.txt).
    """
    global _RUNTIME_HANDLER_SET
    runtime_log.setLevel(level)
    handler = logging.FileHandler(str(path))
    handler.setFormatter(
        logging.Formatter(fmt="[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
    )
    runtime_log.addHandler(handler)
    runtime_log.propagate = False
    _RUNTIME_HANDLER_SET = True


def enable_compilation_cache(
    cache_dir: str | Path | None = None, min_compile_time_secs: float = 1.0
) -> Path:
    """Persist compiled XLA programs across process restarts.

    The remote TPU compile service charges 10-30 s per big program on every
    process start; pointing JAX's compilation cache at a persistent
    directory makes re-runs of the same tutorial/example/bench skip it.
    Called by ``bench.py`` and the example entry points; opt out with
    ``ARTIST_COMPILATION_CACHE=0``.

    Parameters
    ----------
    cache_dir : str | Path | None
        Cache location. Defaults to ``$ARTIST_COMPILATION_CACHE`` when that
        is a path, else ``~/.cache/artist_tpu/jax_cache``.
    min_compile_time_secs : float
        Only cache programs whose compile took at least this long.

    Returns
    -------
    Path
        The directory in use.
    """
    import os

    import jax

    env = os.environ.get("ARTIST_COMPILATION_CACHE", "")
    if cache_dir is None:
        cache_dir = env if env not in ("", "0", "1") else None
    if cache_dir is None:
        cache_dir = Path.home() / ".cache" / "artist_tpu" / "jax_cache"
    cache_dir = Path(cache_dir)
    if env != "0":
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


@contextlib.contextmanager
def profile_trace(log_dir: str | Path):
    """Capture a device profile (XPlane/TensorBoard) around a phase.

    TPU-native upgrade of the reference's wall-clock-only runtime tracker
    (reference: artist/util/__init__.py:141-210): wraps
    ``jax.profiler.trace`` so optimizer phases produce inspectable traces.

    Usage::

        with profile_trace("/tmp/profile"):
            reconstructor.reconstruct_surfaces(...)
    """
    import jax.profiler

    runtime_log.info("profile trace started: %s", log_dir)
    with jax.profiler.trace(str(log_dir)):
        yield
    runtime_log.info("profile trace written: %s", log_dir)


def track_runtime(function: F) -> F:
    """Decorator logging start/finish/wall-clock duration of a function.

    Also opens a ``jax.profiler.TraceAnnotation`` so tracked phases show up
    in TPU profiles. reference: artist/util/__init__.py:141-210.
    """

    @functools.wraps(function)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        name = f"{function.__module__}.{function.__qualname__}"
        runtime_log.info("started: %s", name)
        start = time.perf_counter()
        try:
            import jax.profiler

            with jax.profiler.TraceAnnotation(name):
                result = function(*args, **kwargs)
        except ImportError:  # pragma: no cover - jax always present in practice
            result = function(*args, **kwargs)
        duration = time.perf_counter() - start
        runtime_log.info("finished: %s duration_s=%.6f", name, duration)
        return result

    return wrapper  # type: ignore[return-value]
