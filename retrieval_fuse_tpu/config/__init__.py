"""Config system: YAML with single-level ``inherit_from`` inheritance, recursive
merge, ``dataset`` block fan-out into ``dataset_train`` / ``dataset_val``, and
argparse override semantics.

Behavioral parity with reference ``config/config_handler.py:5-42``:
  * ``inherit_from: base/x.yaml`` resolves relative to the config root directory.
  * child values win over the inherited base (recursive dict merge).
  * every key in the shared ``dataset`` block is copied into ``dataset_train`` and
    ``dataset_val`` unless already present there; the ``dataset`` block itself is
    then deleted.
  * CLI args override config keys unless the arg value is ``None`` or ``-100``
    (the reference's "unset" sentinels); unknown arg keys are added.
"""

from __future__ import annotations

import copy
from pathlib import Path

import yaml

# Directory holding the packaged config tree (base/, super_resolution/, ...).
CONFIG_ROOT = Path(__file__).resolve().parent


def update_recursive(dict1: dict, dict2: dict) -> None:
    """Merge dict2 into dict1 in place; nested dicts merge, scalars overwrite.

    Parity: reference config/config_handler.py:33-42.
    """
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {}
        if isinstance(v, dict):
            if not isinstance(dict1[k], dict):
                dict1[k] = {}
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def update_dataset_configs(config: dict) -> None:
    """Fan the shared `dataset` block out into dataset_train / dataset_val.

    Parity: reference config/config_handler.py:25-30.
    """
    if "dataset" in config:
        for c in config["dataset"]:
            for d in ("dataset_train", "dataset_val"):
                config.setdefault(d, {})
                if c not in config[d]:
                    config[d][c] = config["dataset"][c]


def override_config_with_args(config: dict, args) -> None:
    """Apply argparse overrides: arg wins unless it is None or -100.

    Parity: reference config/config_handler.py:19-22.
    """
    var_args = vars(args) if not isinstance(args, dict) else args
    for k in var_args:
        if (k not in config) or (var_args[k] is not None and var_args[k] != -100):
            config[k] = var_args[k]


def read_config(path, args=None, config_root=None) -> dict:
    """Load a YAML config, resolving single-level inheritance and CLI overrides.

    `inherit_from` paths resolve against `config_root` (defaults to the packaged
    config tree); if not found there, they resolve relative to the config file's
    own directory's parent tree, which lets user-supplied config trees work.
    """
    path = Path(path)
    _config = yaml.safe_load(path.read_text())
    config: dict = {}
    if "inherit_from" in _config:
        root = Path(config_root) if config_root is not None else CONFIG_ROOT
        base_path = root / _config["inherit_from"]
        if not base_path.exists():
            # fall back: resolve relative to the directory structure of `path`
            # (configs live two levels deep: <root>/<task>/<dataset>/<leaf>.yaml)
            for parent in path.resolve().parents:
                cand = parent / _config["inherit_from"]
                if cand.exists():
                    base_path = cand
                    break
        config = yaml.safe_load(base_path.read_text())
    update_recursive(config, _config)
    update_dataset_configs(config)
    if "dataset" in config:
        del config["dataset"]
    if args is not None:
        override_config_with_args(config, args)
    return config


def deep_copy_config(config: dict) -> dict:
    return copy.deepcopy(config)
