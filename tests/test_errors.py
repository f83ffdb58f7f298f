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


def test_retry_on_failure_retries_then_succeeds():
    from neo4j_blue_green_arrow_etl_spark.errors import retry_on_failure

    sleeps = []
    calls = {"n": 0}

    @retry_on_failure(max_retries=5, delay=2.0, backoff=2.0, sleep=sleeps.append)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise RuntimeError("transient")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 4
    assert sleeps == [2.0, 4.0, 8.0]  # exponential schedule


def test_retry_on_failure_exhausts():
    from neo4j_blue_green_arrow_etl_spark.errors import retry_on_failure

    @retry_on_failure(max_retries=2, delay=0.0, sleep=lambda s: None)
    def always_fails():
        raise ValueError("permanent")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        always_fails()


def test_retry_on_failure_selective():
    """Only the declared exception types are retried."""
    from neo4j_blue_green_arrow_etl_spark.errors import NotFoundError, retry_on_failure

    calls = {"n": 0}

    @retry_on_failure(max_retries=5, delay=0, retry_on=(NotFoundError,), sleep=lambda s: None)
    def wrong_type():
        calls["n"] += 1
        raise KeyError("not retryable")

    import pytest as _pytest

    with _pytest.raises(KeyError):
        wrong_type()
    assert calls["n"] == 1
