"""Engine error taxonomy, mirroring the reference's user-visible errors.

The reference surfaces errors as plain strings over HTTP 400
(reference: src/cli/server.rs:63-76) or as GraphQL error lists
(src/cli/server/model/graphql.rs:118-157). The engine keeps one exception
hierarchy so the REST/GraphQL shells can map them uniformly.
"""

from __future__ import annotations


class GusError(Exception):
    """Base class for all engine errors."""


class ModelValidationError(GusError):
    """Invalid model definition (reference: types.rs:147-174)."""


class RecordValidationError(GusError):
    """Invalid record vs model schema (reference: model.rs:231-289)."""


class UnknownModelError(GusError):
    """No such model in the registry (reference: model.rs:146-156)."""


class DuplicateKeyError(GusError):
    """Insert with an existing primary key (reference: json/mod.rs:88-90)."""


class NotFoundError(GusError):
    """No record with the given primary key (reference: json/mod.rs:103)."""


class StorageError(GusError):
    """Storage backend failure (reference: storage_handler.rs:56-71)."""
