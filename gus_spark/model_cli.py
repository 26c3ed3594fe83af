"""Interactive model authoring + storage configuration — parity with the
reference's dialogue CLIs (reference: src/cli/server/model/model_cli.rs:1-226
``create_model``; src/cli/server/model/storage_handler.rs:102-138 +
storage_handler/json/json_cli.rs:1-43 ``configure_storages``).

The dialogues read from an injectable ``input_fn`` (default: ``input``),
so they script cleanly under tests and pipes — the reference uses
dialoguer prompts; the observable contract kept here is the SAME flow,
validation and output artifact:

- create-model: model name (identifier + distinct-plural validated) →
  storage type → attribute loop (name, type, Array element type; arrays
  excluded from pk candidates) → per-attribute constraints (completing
  the reference's "define constraints here" placeholder,
  model_cli.rs:108-110) → primary key select → pk auto-required +
  multi-select further required → pretty-printed ``<name>.json`` into
  the models dir (falls back to stdout when the write fails, like
  model_cli.rs:198-204).
- configure-storages: tolerant load of the existing definitions file
  (missing → defaults; invalid → re-prompt from defaults) → per-type
  config loop → pretty-printed JSON to the file (stdout fallback).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Callable

from gus_spark.inflect import has_distinct_plural
from gus_spark.model.constraints import _ARRAY_KEYS, _KEYS_BY_TYPE
from gus_spark.model.types import (
    STORAGE_TYPES,
    ModelDefinition,
    is_valid_identifier,
)

PRIMITIVES = ["String", "Integer", "Float", "Boolean"]

InputFn = Callable[[str], str]


def _prompt(input_fn: InputFn, label: str, validate) -> str:
    """Re-prompt until ``validate`` returns no error (dialoguer's
    Input::validate_with loop)."""
    while True:
        value = input_fn(f"{label}: ").strip()
        err = validate(value)
        if err is None:
            return value
        print(f"  {err}", file=sys.stderr)


def _select(input_fn: InputFn, label: str, items: list[str]) -> str:
    """Numbered select with default 0 (dialoguer's Select)."""
    menu = " ".join(f"[{i}] {item}" for i, item in enumerate(items))
    while True:
        raw = input_fn(f"{label} ({menu}): ").strip()
        if not raw:
            return items[0]
        if raw in items:
            return raw
        if raw.isdigit() and int(raw) < len(items):
            return items[int(raw)]
        print(f"  pick 0..{len(items) - 1} or a name", file=sys.stderr)


def _confirm(input_fn: InputFn, label: str) -> bool:
    return input_fn(f"{label} [y/n]: ").strip().lower() in ("y", "yes")


def _validate_attr_name(name: str) -> str | None:
    if not is_valid_identifier(name):
        return (
            f"invalid name {name!r}: PascalCase, camelCase, snake_case or"
            " spinal-case, alphabetic only"
        )
    return None


def _validate_model_name(name: str) -> str | None:
    err = _validate_attr_name(name)
    if err:
        return err
    if not has_distinct_plural(name):
        return "Name has no plural variant"  # model_cli.rs:222
    return None


def _ask_constraints(
    input_fn: InputFn, attr: str, primitive: str, is_array: bool
) -> dict:
    """Completion of the reference's constraint placeholder: key=value
    lines, blank to finish; keys restricted to the type's vocabulary."""
    allowed = set(_KEYS_BY_TYPE[primitive]) | (_ARRAY_KEYS if is_array else set())
    spec: dict = {}
    while True:
        raw = input_fn(
            f"Constraint for {attr} (key=value of {sorted(allowed)}, blank"
            " to finish): "
        ).strip()
        if not raw:
            return spec
        key, sep, value = raw.partition("=")
        key = key.strip()
        if not sep or key not in allowed:
            print(f"  expected <key>=<value>, key in {sorted(allowed)}",
                  file=sys.stderr)
            continue
        try:
            spec[key] = json.loads(value.strip())
        except ValueError:
            spec[key] = value.strip()  # bare strings (e.g. regex)


def create_model(
    models_path: str, input_fn: InputFn = input
) -> ModelDefinition:
    """The create-model wizard (model_cli.rs:36-205). Returns the model
    it wrote (tests round-trip it through the registry)."""
    attributes: dict[str, object] = {}
    constraints: dict[str, dict] = {}
    pk_opts: list[str] = []
    required_opts: list[str] = []

    model_name = _prompt(input_fn, "Model Name", _validate_model_name)
    storage_type = _select(
        input_fn, "Storage Type", sorted(STORAGE_TYPES, reverse=True)
    )  # parquet first: the engine's scale default (reference has only json)

    while True:
        attr_name = _prompt(input_fn, "Attribute Name", _validate_attr_name)
        data_type = _select(input_fn, "Data Type", PRIMITIVES + ["Array"])
        if data_type == "Array":
            elem = _select(input_fn, "Array Type", PRIMITIVES)
            attributes[attr_name] = [elem]
            primitive, is_array = elem, True
            # arrays are not pk candidates (model_cli.rs:88-99)
        else:
            attributes[attr_name] = data_type
            primitive, is_array = data_type, False
            if attr_name not in pk_opts:
                pk_opts.append(attr_name)
        spec = _ask_constraints(input_fn, attr_name, primitive, is_array)
        if spec:
            constraints[attr_name] = spec
        if attr_name not in required_opts:
            required_opts.append(attr_name)
        # can't stop while no pk candidate exists (model_cli.rs:119-129)
        if pk_opts and not _confirm(
            input_fn, "Do you want to add another attribute?"
        ):
            break

    primary_key = _select(input_fn, "Primary Key", pk_opts)
    required = [primary_key]  # pk auto-required (model_cli.rs:141-145)
    remaining = [a for a in required_opts if a != primary_key]
    if remaining:
        raw = input_fn(
            f"Set required attributes (comma-separated of {remaining},"
            " blank for none): "
        ).strip()
        for token in (t.strip() for t in raw.split(",") if t.strip()):
            if token in remaining and token not in required:
                required.append(token)

    obj = {
        "model_name": model_name,
        "storage_type": storage_type,
        "attributes": attributes,
        "primary_key": primary_key,
        "required": required,
        "constraints": constraints,
    }
    model = ModelDefinition.from_json(obj)  # wizard output is always valid
    path = os.path.join(models_path, f"{model_name}.json")
    try:
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(obj, fh, indent=2)
    except OSError:  # model_cli.rs:198-204: stdout fallback
        print(json.dumps(obj, indent=2))
        print("unable to write file", file=sys.stderr)
    return model


# --------------------------------------------------------------- storages
def _default_storage_config() -> dict:
    return {"json": None, "parquet": None}


def load_storage_config(path: str) -> dict:
    """Tolerant read (storage_handler.rs:73-100): missing/empty file →
    defaults; malformed JSON → ValueError."""
    config = _default_storage_config()
    try:
        with open(path, encoding="utf-8") as fh:
            data = fh.read()
    except OSError:
        return config
    if not data.strip():
        return config
    loaded = json.loads(data)  # ValueError propagates (InvalidData)
    if not isinstance(loaded, dict):
        raise ValueError("storage definition file must hold an object")
    config.update({k: loaded.get(k) for k in config if k in loaded})
    return config


def _validate_file_path(value: str) -> str | None:
    """json_cli.rs:27-43 PathValidator: a writable file path whose
    parent directory exists."""
    if not value or os.path.isdir(value) or not os.path.basename(value):
        return "Expected file path"
    parent = os.path.dirname(value) or "."
    if not os.path.isdir(parent):
        return "The file's parent directory does not exist"
    return None


def _validate_dir_path(value: str) -> str | None:
    if not value:
        return "Expected directory path"
    parent = os.path.dirname(value.rstrip("/")) or "."
    if not os.path.isdir(parent):
        return "The directory's parent does not exist"
    return None


def configure_storages(
    storage_definitions: str, input_fn: InputFn = input
) -> dict:
    """The configure-storages dialogue (storage_handler.rs:102-138).
    Returns the config it wrote."""
    try:
        config = load_storage_config(storage_definitions)
    except ValueError:
        config = _default_storage_config()  # fall back like :103-106

    while True:
        ty = _select(input_fn, "Storage Type", ["parquet", "json"])
        if ty == "json":
            path = _prompt(input_fn, "Storage File Path", _validate_file_path)
            config["json"] = {"storage_file": path}
        else:
            path = _prompt(
                input_fn, "Warehouse Directory", _validate_dir_path
            )
            config["parquet"] = {"warehouse_dir": path}
        if not _confirm(
            input_fn, "Do you want to configure another storage type?"
        ):
            break

    try:
        with open(storage_definitions, "w", encoding="utf-8") as fh:
            json.dump(config, fh, indent=2)
    except OSError:  # storage_handler.rs:133-137 stdout fallback
        print(json.dumps(config, indent=2))
        print("unable to write file", file=sys.stderr)
    return config
