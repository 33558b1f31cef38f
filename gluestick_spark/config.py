"""Config/env plumbing.

Parity targets (citations into /root/reference):
- ``config_utils``: gluestick/config_utils.py — env-var + config.json
  resolution and the hotglue directory conventions (``sync-output``,
  ``etl-output``, ``snapshots``, ``tmp`` under the job root,
  config_utils.py:46-57).

Driver-side pure Python; Spark jobs read the resolved paths.
"""

from __future__ import annotations

import json
import os
from typing import Any

__all__ = [
    "JobDirs",
    "get_job_dirs",
    "read_config",
    "get_config_value",
    "exception",
    "establish_directories",
    "load_config_json",
]


class JobDirs:
    """Hotglue job directory conventions."""

    def __init__(self, root: str | None = None) -> None:
        self.root = root or os.environ.get("ROOT_DIR", ".")
        self.input_dir = os.environ.get("INPUT_DIR", os.path.join(self.root, "sync-output"))
        self.output_dir = os.environ.get("OUTPUT_DIR", os.path.join(self.root, "etl-output"))
        self.snapshot_dir = os.environ.get("SNAPSHOT_DIR", os.path.join(self.root, "snapshots"))
        self.tmp_dir = os.environ.get("TMP_DIR", os.path.join(self.root, "tmp"))

    def ensure(self) -> "JobDirs":
        for d in (self.output_dir, self.snapshot_dir, self.tmp_dir):
            os.makedirs(d, exist_ok=True)
        return self


def get_job_dirs(root: str | None = None) -> JobDirs:
    return JobDirs(root)


def read_config(root: str | None = None, filename: str = "config.json") -> dict[str, Any]:
    """Load ``{root}/config.json`` (empty dict when absent)."""
    root = root or os.environ.get("ROOT_DIR", ".")
    path = os.path.join(root, filename)
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


def exception(message: str, root: str | None = None, error_file: str = "errors.txt") -> None:
    """Persist ``message`` to ``{root}/errors.txt`` then raise
    (gluestick/etl_utils.py:834-853): downstream job tooling reads the file
    after the process dies."""
    root = root or os.environ.get("ROOT_DIR", ".")
    try:
        with open(os.path.join(root, error_file), "a") as f:
            f.write(message + "\n")
    except OSError:
        pass
    raise Exception(message)


def establish_directories(global_vars: dict[str, Any]) -> tuple:
    """Resolve job directories/ids env-first and create them on disk,
    returning the reference's 9-tuple ``(ROOT_DIR, base_input_dir,
    output_dir, snapshot_dir, tenant_id, flow_id, today, tmp_dir,
    config_json)`` (gluestick/config_utils.py:12-95). Precedence per value:
    env var > ``global_vars`` > default relative to ``ROOT_DIR``."""
    import datetime

    def get_var(name: str, default: Any) -> Any:
        return os.getenv(name, global_vars.get(name, default))

    root = get_var("ROOT_DIR", ".")
    base_input_dir = get_var("base_input_dir", f"{root}/sync-output")
    output_dir = get_var("output_dir", f"{root}/etl-output")
    snapshot_dir = get_var("snapshot_dir", f"{root}/snapshots")
    tmp_dir = get_var("tmp_dir", f"{root}/tmp")
    config_json = get_var("config_json", f"{root}/config.json")
    today = get_var("today", None)
    tenant_id = get_var("USER_ID", get_var("TENANT", None))
    flow_id = get_var("FLOW", None)

    if today is None:
        today = datetime.date.today()
    else:
        today = datetime.datetime.strptime(today, "%Y%m%d")

    for d in (base_input_dir, output_dir, snapshot_dir, tmp_dir):
        os.makedirs(d, exist_ok=True)

    if not os.path.exists(config_json):
        config_json = None

    return (
        root,
        base_input_dir,
        output_dir,
        snapshot_dir,
        tenant_id,
        flow_id,
        today,
        tmp_dir,
        config_json,
    )


def load_config_json(config_json: str | None, config_vars: dict[str, Any]) -> dict[str, Any]:
    """Merge a config.json file over default variables; empty-string or
    missing keys keep their defaults (gluestick/config_utils.py:97-163).
    Returns ``config_vars`` unchanged when the path is falsy/absent."""
    if not config_json or not os.path.exists(config_json):
        return config_vars
    with open(config_json) as f:
        data = json.load(f)
    for key in config_vars:
        if key not in data or data[key] == "":
            data[key] = config_vars[key]
    return data


def get_config_value(key: str, config: dict[str, Any] | None = None, default: Any = None) -> Any:
    """Resolve a config value: env var (upper-cased key) wins, then
    config.json, then default."""
    env = os.environ.get(key.upper())
    if env is not None:
        return env
    if config and key in config:
        return config[key]
    return default
