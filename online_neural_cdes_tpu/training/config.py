"""Config-grid system: json5 sweep suites, nested grid expansion,
per-dataset option merge, hyperopt-result injection, test-mode shrinkage.

Capability parity with reference /root/reference/experiments/utils.py:
``nested_parameter_grid`` expansion of nested dict-of-list grids
(utils.py:145-202 via sacredex), ``parse_dataset_json`` merging of the
dataset registry (utils.py:24-47), ``multi-config`` unions, test-mode
shrinkage (utils.py:124-142), and hyperopt best-parameter injection
(utils.py:50-108 — backed by the local ledger instead of MongoDB).
"""

from __future__ import annotations

import copy
import itertools
import os
from typing import List, Optional

__all__ = [
    "load_json",
    "nested_parameter_grid",
    "parse_dataset_json",
    "parse_configuration_json",
    "set_test_mode",
    "update_hyperparams",
]

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CONFIG_DIR = os.path.join(_HERE, "configurations")


def load_json(path: str) -> dict:
    """json5 parsing is pure Python and slow (~100 ms/file); suites and the
    dataset registry are static, so cache by absolute path + mtime."""
    path = os.path.abspath(path)
    return copy.deepcopy(_load_json_cached(path, os.path.getmtime(path)))


def _load_json_cached(path: str, _mtime: float) -> dict:
    import json5

    key = (path, _mtime)
    if key not in _JSON_CACHE:
        with open(path) as f:
            _JSON_CACHE[key] = json5.load(f)
    return _JSON_CACHE[key]


_JSON_CACHE: dict = {}


def _flatten(d: dict, prefix: str = "") -> dict:
    """Nested dict-of-lists -> {dunder_path: list_of_values}."""
    out = {}
    for key, value in d.items():
        path = f"{prefix}{key}"
        if isinstance(value, dict):
            out.update(_flatten(value, prefix=f"{path}__"))
        else:
            assert isinstance(value, list), (
                f"Grid leaves must be lists; {path} is {type(value).__name__}"
            )
            out[path] = value
    return out


def _unflatten(flat: dict) -> dict:
    out: dict = {}
    for path, value in flat.items():
        node = out
        parts = path.split("__")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def nested_parameter_grid(grid: dict) -> List[dict]:
    """sklearn-ParameterGrid semantics over arbitrarily nested dicts whose
    leaves are lists of options."""
    flat = _flatten(grid)
    keys = list(flat.keys())
    configs = []
    for combo in itertools.product(*(flat[k] for k in keys)):
        configs.append(_unflatten(dict(zip(keys, combo))))
    return configs


def _update_nested(config: dict, updater: dict) -> dict:
    """Recursive leaf-wise merge: ``updater`` values win, but sibling keys
    in nested dicts survive (a shallow dict.update would let a suite-level
    ``trainer: {max_epochs: [10]}`` wholesale replace a sub-config's
    ``trainer: {lr: [5e-4]}``)."""
    for key, value in updater.items():
        if isinstance(value, dict) and isinstance(config.get(key), dict):
            _update_nested(config[key], value)
        else:
            config[key] = value
    return config


def parse_dataset_json(dataset_name: str, config_dir: str = DEFAULT_CONFIG_DIR) -> dict:
    """Dataset registry entry -> {dataset, model, trainer} config updates
    (reference utils.py:24-47)."""
    cfg = load_json(os.path.join(config_dir, "dataset.json5"))[dataset_name]
    return {
        "dataset": {
            k: cfg[k]
            for k in ("data_loc", "problem", "use_static", "evaluation_metric", "minimize")
        },
        "model": {"return_sequences": cfg["problem"] == "online"},
        "trainer": {
            "loss_str": cfg["loss_str"],
            "metrics": cfg["metrics"],
            "val_metric_to_monitor": cfg["evaluation_metric"],
        },
        "output_dim": cfg.get("output_dim", 1),
        "label_dtype": cfg.get("label_dtype"),
    }


def set_test_mode(cfg: dict, run_name: Optional[str] = None):
    """Shrink a suite for smoke runs (reference utils.py:124-142)."""
    cfg = copy.deepcopy(cfg)
    cfg["test_mode"] = [True]
    if "total_trials" in cfg:
        cfg["total_trials"] = [2]
    cfg.setdefault("trainer", {})
    cfg["trainer"]["max_epochs"] = [10]
    if run_name is not None:
        run_name = f"test_{run_name}"
    return cfg, run_name


def update_hyperparams(configs: List[dict], ledger=None, run_name: str = "hyperopt"):
    """Inject stored hyperopt best-parameters into each config whose
    ``hyperparameters`` mode is 'load' (reference utils.py:50-108; the run
    store is the local ledger instead of MongoDB)."""
    if ledger is None:
        return configs
    hyperopt_runs = ledger.query(lambda e: e.get("run_name") == run_name
                                 and e.get("status") == "completed"
                                 and "best_parameters" in e.get("info", {}))
    for cfg in configs:
        if cfg.get("hyperparameters") in ("hyperopt", "set"):
            continue
        interpolation = cfg["dataset"].get("interpolation")
        if interpolation in (
            "linear_cubic_smoothing", "linear_quintic_smoothing",
            "linear_forward_fill", "cubic_forward_fill",
        ):
            interpolation = "linear"
        elif interpolation == "hermite":
            # Hermite is the causal cubic; reuse the cubic search result.
            interpolation = "cubic"
        matches = [
            h for h in hyperopt_runs
            if h["config"]["dataset"].get("interpolation") == interpolation
            and h["config"]["dataset_name"] == cfg["dataset_name"]
            and h["config"]["model"]["model_string"] == cfg["model"]["model_string"]
            and h["config"]["model"].get("adjoint") == cfg["model"].get("adjoint")
        ]
        if not matches:
            raise FileNotFoundError(f"Cannot find hyperopt for config\n{cfg}")
        best = matches[-1]["info"]["best_parameters"]
        _update_nested(cfg, best)
    return configs


def parse_configuration_json(
    run_name: str,
    config_dir: str = DEFAULT_CONFIG_DIR,
    test_mode: bool = False,
    ledger=None,
    hyperopt_run_name: str = "hyperopt",
):
    """Suite name -> fully-expanded config list (reference utils.py:145-202)."""
    suites = load_json(os.path.join(config_dir, "configurations.json5"))
    if run_name not in suites:
        raise ValueError(
            f"No configuration suite named {run_name!r}; available: "
            f"{sorted(suites)}"
        )
    cfg = copy.deepcopy(suites[run_name])

    db_name = run_name
    if test_mode:
        cfg, db_name = set_test_mode(cfg, run_name)

    assert cfg["hyperparameters"] in (["hyperopt"], ["load"], ["set"])

    multi = cfg.pop("multi-config", None)
    if multi:
        configs = []
        for sub in multi.values():
            merged = copy.deepcopy(sub)
            _update_nested(merged, copy.deepcopy(cfg))
            configs.extend(nested_parameter_grid(merged))
    else:
        configs = nested_parameter_grid(cfg)

    for cfg_i in configs:
        dataset_cfg = parse_dataset_json(cfg_i["dataset_name"], config_dir)
        _update_nested(cfg_i, dataset_cfg)
        if cfg_i.get("hyperparameters") == "hyperopt":
            cfg_i["evaluation_metric"] = cfg_i["dataset"]["evaluation_metric"]
            cfg_i["minimize"] = cfg_i["dataset"]["minimize"]

    configs = update_hyperparams(configs, ledger=ledger, run_name=hyperopt_run_name)
    return configs, db_name
