"""CLI arg-validation tests (ports cli/index.rs:115-179 behaviors)."""

import json

from gus_spark.cli import build_app, build_parser, validate


def _args(tmp_path, **over):
    models = tmp_path / "models"
    models.mkdir(exist_ok=True)
    base = ["server", "-m", str(models)]
    for k, v in over.items():
        base += [f"--{k}", str(v)]
    return build_parser().parse_args(base)


def test_valid_args(tmp_path):
    assert validate(_args(tmp_path)) is None


def test_port_bounds(tmp_path):
    assert validate(_args(tmp_path, port=0)) is not None
    assert validate(_args(tmp_path, port=70000)) is not None
    assert validate(_args(tmp_path, port=8081)) is None


def test_missing_models_dir(tmp_path):
    args = build_parser().parse_args(["server", "-m", str(tmp_path / "nope")])
    assert "not a directory" in validate(args)


def test_build_app_loads_models(spark, tmp_path):
    models = tmp_path / "models"
    models.mkdir()
    (models / "movie.json").write_text(
        json.dumps(
            {
                "model_name": "movie",
                "attributes": {"id": "Integer", "name": "String"},
                "primary_key": "id",
                "required": ["id"],
            }
        )
    )
    args = build_parser().parse_args(
        ["server", "-m", str(models), "-w", str(tmp_path / "wh")]
    )
    registry, store, api = build_app(args)
    assert registry.names() == ["movie"]
    status, payload = api.handle(
        "POST", "/api/rest/movie", json.dumps({"id": 1, "name": "x"})
    )
    assert status == 201, payload
    assert api.handle("GET", "/api/rest/movie/1")[0] == 200
