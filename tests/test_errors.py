from __future__ import annotations

from neo4j_blue_green_arrow_etl_spark.errors import (
    AlreadyExistsError,
    InternalError,
    InvalidArgumentError,
    NotFoundError,
    UnknownError,
    interpret,
)


def test_not_found():
    assert isinstance(interpret(RuntimeError("gRPC NOT_FOUND: no db")), NotFoundError)
    assert isinstance(interpret(RuntimeError("table does not exist")), NotFoundError)


def test_already_exists_case_insensitive():
    assert isinstance(interpret(RuntimeError("Database already exists")), AlreadyExistsError)
    assert isinstance(interpret(RuntimeError("ALREADY_EXISTS")), AlreadyExistsError)


def test_invalid_argument():
    assert isinstance(interpret(RuntimeError("INVALID_ARGUMENT: bad name")), InvalidArgumentError)


def test_internal():
    assert isinstance(interpret(RuntimeError("INTERNAL failure")), InternalError)


def test_unknown_preserves_cause():
    src = RuntimeError("something odd")
    err = interpret(src)
    assert isinstance(err, UnknownError)
    assert err.__cause__ is src
