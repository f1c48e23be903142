"""Error classification + retry-loop tests (reference layer:
tests/test_error_handling.py:43-375 — classification table, fail-fast vs
retry-n-times, never-retry cast/evolution errors)."""

import pytest

from dlt_iceberg_spark.errors import (
    CastingError,
    CommitConflictError,
    ErrorCategory,
    NamespaceNotFoundError,
    RetryPolicy,
    SchemaEvolutionError,
    TableAlreadyExistsError,
    TableNotFoundError,
    classify_error,
    is_retryable,
    user_message,
)


@pytest.mark.parametrize(
    "exc,category",
    [
        (CommitConflictError("lost race"), ErrorCategory.RETRYABLE_TRANSIENT),
        (ConnectionError("refused"), ErrorCategory.RETRYABLE_TRANSIENT),
        (TimeoutError(), ErrorCategory.RETRYABLE_TRANSIENT),
        (TableNotFoundError("ns.t"), ErrorCategory.CLIENT_ERROR),
        (TableAlreadyExistsError("ns.t"), ErrorCategory.CLIENT_ERROR),
        (CastingError("float->int"), ErrorCategory.CLIENT_ERROR),
        (SchemaEvolutionError("drop required"), ErrorCategory.CLIENT_ERROR),
        (PermissionError("denied"), ErrorCategory.PERMISSION_ERROR),
        (RuntimeError("org.apache.iceberg.exceptions.CommitFailedException: x"),
         ErrorCategory.RETRYABLE_TRANSIENT),
        (RuntimeError("HTTP 503 ServiceUnavailable"), ErrorCategory.RETRYABLE_TRANSIENT),
        (RuntimeError("AuthorizationExpired: token expired"), ErrorCategory.RETRYABLE_AUTH),
        (RuntimeError("403 Forbidden"), ErrorCategory.PERMISSION_ERROR),
        (ValueError("novel"), ErrorCategory.UNKNOWN),
    ],
)
def test_classification_table(exc, category):
    assert classify_error(exc) is category


def test_retryable_split():
    assert is_retryable(CommitConflictError())
    assert is_retryable(RuntimeError("AuthorizationExpired"))
    assert not is_retryable(CastingError("x"))
    assert not is_retryable(ValueError("unknown fails fast"))


def test_retry_succeeds_after_transient_failures():
    sleeps = []
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise CommitConflictError("retry me")
        return "ok"

    policy = RetryPolicy(max_retries=5, backoff_base=2.0, sleep=sleeps.append)
    assert policy.run(flaky) == "ok"
    assert attempts["n"] == 3
    assert sleeps == [1.0, 2.0]  # 2.0**0, 2.0**1


def test_retry_exhausts_and_raises():
    policy = RetryPolicy(max_retries=3, backoff_base=0.0, sleep=lambda _: None)
    with pytest.raises(CommitConflictError):
        policy.run(lambda: (_ for _ in ()).throw(CommitConflictError("always")))


def test_casting_error_never_retried():
    attempts = {"n": 0}

    def bad_cast():
        attempts["n"] += 1
        raise CastingError("aware->naive timestamp")

    policy = RetryPolicy(max_retries=5, sleep=lambda _: None)
    with pytest.raises(CastingError):
        policy.run(bad_cast)
    assert attempts["n"] == 1  # fail-fast, no retries


def test_on_retry_hook_runs_between_attempts():
    refreshes = []
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 2:
            raise ConnectionError("blip")
        return attempts["n"]

    policy = RetryPolicy(max_retries=3, sleep=lambda _: None)
    assert policy.run(flaky, on_retry=lambda: refreshes.append(1)) == 2
    assert refreshes == [1]  # refreshed once, between attempt 1 and 2


def test_user_message_carries_category_and_hint():
    msg = user_message(CastingError("float64 -> int32"))
    assert "client_error" in msg and "CastingError" in msg and "fix the pipeline" in msg


@pytest.mark.parametrize(
    "exc,fragments",
    [
        # reference message goldens (tests/test_error_handling.py:126-163),
        # mapped onto this engine's category-hint vocabulary: the original
        # message must survive verbatim and the hint must carry the same
        # actionable concept.
        (TableNotFoundError("table foo not found"), ["foo not found", "missing table"]),
        (NamespaceNotFoundError("namespace bar gone"), ["bar gone", "missing table/namespace"]),
        (CastingError("schema mismatch"), ["schema mismatch", "fix the pipeline"]),
        (PermissionError("no permission"), ["no permission", "grants"]),
        (CommitConflictError("concurrent write"), ["concurrent write", "retried"]),
    ],
)
def test_per_type_user_messages(exc, fragments):
    msg = user_message(exc)
    for frag in fragments:
        assert frag in msg, (msg, frag)
