"""Model registry — the engine's catalog.

Ports the reference's model-directory loader (reference:
src/cli/server/model.rs:175-210 ``parse_models``, 146-156 ``parse_model``):

- each ``*.json`` file in the models dir declares one model
- unparsable / invalid files are silently skipped (model.rs:187-199)
- two models whose names collide on the *pluralized camelCase* form are
  BOTH dropped (model.rs:192-204; fixtures dup1/dup2, inflection_dup1/2)

Unlike the reference — which re-reads and re-validates the whole model dir
on every request — the registry loads once per session and exposes
``reload()`` for hot-reload. Each model maps to a Spark ``StructType`` and
a parquet-backed table (see gus_spark.storage).
"""

from __future__ import annotations

import json
import os

from gus_spark.errors import ModelValidationError, UnknownModelError
from gus_spark.inflect import plural_camel, singularize
from gus_spark.model.types import ModelDefinition


def parse_model_file(path: str) -> ModelDefinition:
    with open(path, encoding="utf-8") as fh:
        try:
            obj = json.load(fh)
        except ValueError as e:
            raise ModelValidationError(f"{path}: not valid JSON: {e}") from e
    if not isinstance(obj, dict):
        raise ModelValidationError(f"{path}: model file must hold a JSON object")
    return ModelDefinition.from_json(obj)


def parse_models(models_dir: str) -> list[ModelDefinition]:
    """Load all valid models from a directory, dropping plural-camelCase
    duplicates entirely (both sides), per model.rs:192-204."""
    parsed: list[ModelDefinition] = []
    for entry in sorted(os.listdir(models_dir)):
        if not entry.endswith(".json"):
            continue
        try:
            parsed.append(parse_model_file(os.path.join(models_dir, entry)))
        except ModelValidationError:
            continue  # silently ignored, model.rs:187-199
    by_key: dict[str, list[ModelDefinition]] = {}
    for model in parsed:
        by_key.setdefault(plural_camel(model.model_name), []).append(model)
    return [ms[0] for ms in by_key.values() if len(ms) == 1]


class ModelRegistry:
    """Session-lifetime catalog of models (name -> definition)."""

    def __init__(self, models_dir: str | None = None):
        self.models_dir = models_dir
        self._models: dict[str, ModelDefinition] = {}
        if models_dir is not None:
            self.reload()

    def reload(self) -> None:
        self._models = {
            m.model_name: m for m in parse_models(self.models_dir)
        }

    def register(self, model: ModelDefinition) -> None:
        self._models[model.model_name] = model

    def get(self, name: str) -> ModelDefinition:
        """Resolve by singular model name; reject plural/unknown forms the
        way the reference's singular-name check does (types.rs:183-188)."""
        model = self._models.get(name)
        if model is None:
            singular = singularize(name)
            if singular != name and singular in self._models:
                raise UnknownModelError(
                    f"unknown model {name!r} — did you mean {singular!r}?"
                )
            raise UnknownModelError(f"unknown model {name!r}")
        return model

    def names(self) -> list[str]:
        return sorted(self._models)

    def __contains__(self, name: str) -> bool:
        return name in self._models

    def __iter__(self):
        return iter(self._models.values())
