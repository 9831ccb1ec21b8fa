"""Persistent XLA compile cache (TPU.COMPILE_CACHE).

The flagship train step takes minutes to compile; with the cache enabled a
restart — preemption resume (``--resume auto``), re-launch with an unchanged
config — deserializes the executable in seconds instead.  Safe to share
across processes of a pod (the cache is keyed by program + compile options).
"""

import os


def enable_compile_cache(path):
    """Point jax at a persistent compilation cache directory; '' disables.

    Best-effort: failures (read-only FS, jax config already finalized) are
    ignored — the run proceeds with in-memory compilation only.
    """
    if not path:
        return False
    import jax

    path = os.path.expanduser(path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        return True
    except Exception:
        return False


def enable_repo_cache():
    """Enable the repo-root ``.jax_cache`` used by bench and the perf tools.

    This is the cache the driver's end-of-round bench/dryrun runs depend on
    (gitignored; see CLAUDE.md) — one shared location so a warm entry from
    bench also serves profile_step/hlo_traffic/compare_refine_res.
    """
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    return enable_compile_cache(os.path.join(repo_root, ".jax_cache"))
