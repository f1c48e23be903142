"""Error types + classification + retry, mirroring the reference's
error_handling.py (224 LoC): a classification table deciding retryable vs
fail-fast, a bounded-backoff retry loop, and user-facing hint strings.

Reference semantics (error_handling.py:44-98):
- transient commit/lock/5xx errors  -> retry with exponential backoff
- auth-expired                      -> retry (token refresh happens upstream)
- client errors (missing table/ns, already-exists, validation, bad request)
                                    -> fail fast
- auth/permission                   -> fail fast
- CastingError / SchemaEvolutionError are NEVER retried
  (destination_client.py:1484-1494).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from enum import Enum
from typing import Callable, TypeVar

logger = logging.getLogger("dlt_iceberg_spark")

T = TypeVar("T")


class ExpectationViolationError(Exception):
    """A batch failed a table's data-quality expectations (fail mode)."""


class CastingError(Exception):
    """Unsafe or impossible cast between source data and target schema
    (schema_casting.py CastingError analogue)."""


class SchemaEvolutionError(Exception):
    """Requested schema change is not a safe evolution
    (schema_evolution.py SchemaEvolutionError analogue)."""


class PartitionSpecError(ValueError):
    """Invalid partition transform for the column type (partition_builder.py)."""


class CommitConflictError(Exception):
    """Optimistic snapshot commit lost the race (another writer advanced the
    table). Retryable — the lake layer re-reads current state and re-applies."""


class NonAtomicCommitError(Exception):
    """The table's storage cannot rename atomically (object stores: S3A
    rename is copy+delete), so the pointer-swap commit protocol is unsafe —
    concurrent writers could both 'win'.  The supported deployment routes
    the pointer swap through a catalog's compare-and-swap (REST/Glue/JDBC —
    lake/iceberg_config.py carries the conf surface); to consciously accept
    last-writer-wins on a single-writer pipeline, set table property
    commit.allow-non-atomic-pointer=true."""


class TableNotFoundError(Exception):
    pass


class NamespaceNotFoundError(Exception):
    pass


class TableAlreadyExistsError(Exception):
    pass


class ErrorCategory(Enum):
    RETRYABLE_TRANSIENT = "retryable_transient"
    RETRYABLE_AUTH = "retryable_auth"
    CLIENT_ERROR = "client_error"
    PERMISSION_ERROR = "permission_error"
    CONFIG_ERROR = "config_error"
    UNKNOWN = "unknown"


#: classification table (error_handling.py:44-98 analogue, over our exception
#: types plus Spark/Py4J error text patterns for a real Iceberg backend).
_CLASSIFICATION: list[tuple[type[Exception], ErrorCategory]] = [
    (CommitConflictError, ErrorCategory.RETRYABLE_TRANSIENT),
    (ConnectionError, ErrorCategory.RETRYABLE_TRANSIENT),
    (TimeoutError, ErrorCategory.RETRYABLE_TRANSIENT),
    (TableNotFoundError, ErrorCategory.CLIENT_ERROR),
    (NamespaceNotFoundError, ErrorCategory.CLIENT_ERROR),
    (TableAlreadyExistsError, ErrorCategory.CLIENT_ERROR),
    (CastingError, ErrorCategory.CLIENT_ERROR),
    (ExpectationViolationError, ErrorCategory.CLIENT_ERROR),
    (SchemaEvolutionError, ErrorCategory.CLIENT_ERROR),
    (PartitionSpecError, ErrorCategory.CLIENT_ERROR),
    (PermissionError, ErrorCategory.PERMISSION_ERROR),
]

_TRANSIENT_MARKERS = (
    "CommitFailedException",
    "CommitStateUnknownException",
    "waiting for lock",
    "ServiceUnavailable",
    "503",
    "500",
)
_AUTH_MARKERS = ("AuthorizationExpired", "token expired", "401")
_PERMISSION_MARKERS = ("Forbidden", "Unauthorized", "403", "AccessDenied")


def classify_error(exc: Exception) -> ErrorCategory:
    for etype, category in _CLASSIFICATION:
        if isinstance(exc, etype):
            return category
    text = f"{type(exc).__name__}: {exc}"
    if any(m in text for m in _AUTH_MARKERS):
        return ErrorCategory.RETRYABLE_AUTH
    if any(m in text for m in _PERMISSION_MARKERS):
        return ErrorCategory.PERMISSION_ERROR
    if any(m in text for m in _TRANSIENT_MARKERS):
        return ErrorCategory.RETRYABLE_TRANSIENT
    return ErrorCategory.UNKNOWN


def is_retryable(exc: Exception) -> bool:
    return classify_error(exc) in (
        ErrorCategory.RETRYABLE_TRANSIENT,
        ErrorCategory.RETRYABLE_AUTH,
    )


_HINTS = {
    ErrorCategory.RETRYABLE_TRANSIENT: "Transient commit/service failure; the operation was retried automatically.",
    ErrorCategory.RETRYABLE_AUTH: "Credentials expired mid-operation; refresh tokens/secrets.",
    ErrorCategory.CLIENT_ERROR: "The request is invalid as stated (missing table/namespace, unsafe cast, bad spec); fix the pipeline definition.",
    ErrorCategory.PERMISSION_ERROR: "The principal lacks access; check warehouse/catalog grants.",
    ErrorCategory.CONFIG_ERROR: "Engine misconfiguration; check catalog/warehouse settings.",
    ErrorCategory.UNKNOWN: "Unclassified failure; not retried (fail-fast).",
}


def user_message(exc: Exception) -> str:
    cat = classify_error(exc)
    return f"[{cat.value}] {type(exc).__name__}: {exc} — {_HINTS[cat]}"


@dataclass
class RetryPolicy:
    """destination_client.py:147-149 defaults: 5 attempts, 2.0^attempt backoff."""

    max_retries: int = 5
    backoff_base: float = 2.0
    sleep: Callable[[float], None] = time.sleep

    def run(self, fn: Callable[[], T], on_retry: Callable[[], None] | None = None) -> T:
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                return fn()
            except Exception as exc:  # noqa: BLE001
                last = exc
                if not is_retryable(exc) or attempt == self.max_retries - 1:
                    logger.error(user_message(exc))
                    raise
                delay = self.backoff_base**attempt
                logger.warning(
                    "retryable failure (attempt %d/%d, backoff %.1fs): %s",
                    attempt + 1,
                    self.max_retries,
                    delay,
                    user_message(exc),
                )
                self.sleep(delay)
                if on_retry is not None:
                    on_retry()  # e.g. table.refresh() between attempts
        raise last  # pragma: no cover
