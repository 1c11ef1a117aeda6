"""CLI --platform handling, shared by every app entry point.

This image's ``sitecustomize`` pre-imports jax with ``JAX_PLATFORMS=axon``
(the remote TPU tunnel), so environment variables set by user code are too
late — only ``jax.config.update`` works, and only until a backend
initializes. One shared helper instead of three copy-pasted blocks, and a
WARNING instead of a silent pass: a user who asked for ``--platform cpu``
must never silently run on the degraded TPU tunnel (compiles there can
queue for minutes; see CLAUDE.md).
"""
from __future__ import annotations

import sys


def force_platform(name: str | None) -> None:
    """Pin the jax platform for a CLI run ("cpu" forces CPU; anything
    else clears the pin so the default backend is used). No-op on None
    or empty."""
    if not name:
        return
    import jax
    try:
        jax.config.update("jax_platforms",
                          "cpu" if name == "cpu" else "")
    except Exception as e:  # noqa: BLE001 — backend already initialized
        print(f"warning: could not force platform {name!r} ({e}); "
              f"continuing on the already-initialized backend",
              file=sys.stderr)
