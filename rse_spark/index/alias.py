"""Index aliases: a stable name that points at a physical index root.

ES alias parity for the operational story this repo's lifecycle ops
need: ``reindex`` builds into a NEW root, then the alias flips to it
atomically (one ``os.replace`` of a one-line file) — blue/green index
swaps with no serving gap and no path changes for clients. The
serving tier resolves the alias at open AND watches the alias file in
its per-query generation check, so a LIVE replica follows a flip on
its next query, dropping every cache — the same bounded-staleness
contract as a writer commit on a single root.

An alias root is a directory holding exactly one ``ALIAS`` file (the
target path). It is deliberately NOT an index: a manifest/ directory
and an ALIAS file are mutually exclusive, so nothing can half-resolve.
"""

from __future__ import annotations

import os

ALIAS_FILE = "ALIAS"


def get_alias(path: str) -> "str | None":
    """The alias target recorded at ``path``, or None when ``path``
    is not an alias directory."""
    try:
        with open(os.path.join(path, ALIAS_FILE)) as f:
            return f.read().strip() or None
    except FileNotFoundError:
        return None


def resolve(path: str) -> str:
    """Follow an alias one hop. Aliases never chain (an alias target
    must be a real index) — a chain means someone aliased an alias,
    which is refused loudly rather than followed."""
    target = get_alias(path)
    if target is None:
        return path
    if get_alias(target) is not None:
        raise ValueError(
            f"alias {path} points at another alias ({target}); "
            f"chains are not allowed"
        )
    if not os.path.isdir(os.path.join(target, "manifest")):
        raise FileNotFoundError(
            f"alias {path} points at {target}, which is not an index"
        )
    return target


def set_alias(path: str, target: str) -> None:
    """Atomically point ``path`` at index root ``target``.

    ``target`` must be a finished index (manifest present); ``path``
    must not itself be an index root. The write is tmp + os.replace,
    so a concurrent resolve sees either the old or the new target,
    never a torn file."""
    if not os.path.isdir(os.path.join(target, "manifest")):
        raise FileNotFoundError(f"{target} is not an index (no manifest)")
    if os.path.isdir(os.path.join(path, "manifest")):
        raise ValueError(
            f"{path} is an index root; refusing to shadow it with an "
            f"alias"
        )
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, ALIAS_FILE + ".tmp")
    with open(tmp, "w") as f:
        f.write(os.path.abspath(target))
    os.replace(tmp, os.path.join(path, ALIAS_FILE))
