"""`-config conf.json` support (reference config/config.go:14-157).

The reference merges a JSON config file UNDER explicit command-line flags:
a flag still at its default takes the config value; an explicitly-set flag
wins (config.go:64-154 compares each option against its default constant —
same observable rule as here). Keys mirror config.go's `Config` struct:

    connection, mapping, srid, limitto, limitto_cache_buffer,
    cachedir, diffdir, schemas{import,production,backup},
    expiretiles_dir, expiretiles_zoom, replication_url,
    replication_interval (minutes)

Spark-native notes:
- ``cachedir`` (the reference's LevelDB element cache) maps to our
  ``-write-parquet`` state/output directory — the closest analog; a
  ``write_parquet`` key is also accepted directly.
- ``replication_interval`` is minutes (config.go MinutesInterval) and
  becomes the `run` subcommand's poll interval, floored at 1 minute as in
  config.go:133-136.
- ``limitto: "NONE"`` on the command line clears a config-file limitto
  (config.go:107-110).
"""

from __future__ import annotations

import argparse
import json

# JSON key -> argparse dest for keys that map 1:1 onto flags
_KEY_TO_DEST = {
    "connection": "connection",
    "mapping": "mapping",
    "srid": "srid",
    "limitto": "limitto",
    "limitto_cache_buffer": "limittocachebuffer",
    "cachedir": "write_parquet",
    "write_parquet": "write_parquet",
    "diffdir": "diffdir",
    "expiretiles_dir": "expiretiles_dir",
    "replication_url": "url",
}


def load_config(path: str) -> dict:
    with open(path) as fh:
        conf = json.load(fh)
    if not isinstance(conf, dict):
        raise ValueError(f"config file {path}: expected a JSON object")
    return conf


def merge_config(args: argparse.Namespace, parser: argparse.ArgumentParser) -> None:
    """Fill every arg still at its parser default from ``args.config``.

    Mutates ``args`` in place; no-op without ``-config``. Mirrors
    config.go's updateFromConfig: explicit flags beat config beats
    defaults, with the reference's special cases (limitto NONE,
    expiretiles_zoom clamp, replication-interval floor)."""
    conf = load_config(args.config) if getattr(args, "config", "") else {}

    def at_default(dest: str) -> bool:
        return hasattr(args, dest) and getattr(args, dest) == parser.get_default(dest)

    for key, dest in _KEY_TO_DEST.items():
        if key in conf and at_default(dest):
            setattr(args, dest, conf[key])

    schemas = conf.get("schemas", {}) or {}
    for sub in ("import", "production", "backup"):
        dest = f"dbschema_{sub}"
        if schemas.get(sub) and at_default(dest):
            setattr(args, dest, schemas[sub])

    # limitto NONE on the cmdline: force no limit even if config sets one
    if getattr(args, "limitto", "") == "NONE":
        args.limitto = ""

    if hasattr(args, "expiretiles_zoom"):
        if "expiretiles_zoom" in conf and at_default("expiretiles_zoom"):
            args.expiretiles_zoom = int(conf["expiretiles_zoom"])
        if args.expiretiles_zoom and not (6 <= args.expiretiles_zoom <= 18):
            args.expiretiles_zoom = 14  # config.go:123-125

    if hasattr(args, "poll_interval") and at_default("poll_interval"):
        minutes = conf.get("replication_interval")
        if minutes:
            args.poll_interval = max(float(minutes), 1.0) * 60.0

    # post-merge validation (config.go check())
    errs = []
    if hasattr(args, "srid") and args.srid not in (3857, 4326):
        errs.append("only -srid=3857 or -srid=4326 are supported")
    if hasattr(args, "mapping") and not args.mapping:
        errs.append("missing mapping")
    if errs:
        parser.error("; ".join(errs))
