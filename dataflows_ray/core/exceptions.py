"""Error wrapping with step name/position.

Parity target: reference ``dataflows/base/exceptions.py:5-16`` and
``dataflows/base/datastream_processor.py:88-97`` (errors are wrapped in a
``ProcessorError`` carrying the processor name and chain position).
"""

from __future__ import annotations


class FlowError(Exception):
    """Base class for engine errors."""


class StepError(FlowError):
    """An error raised while planning or executing a flow step.

    Mirrors the reference's ``ProcessorError``: carries the originating
    exception, the step name and its 0-based position in the chain.
    """

    def __init__(self, cause: BaseException, *, step_name: str, position: int):
        self.cause = cause
        self.step_name = step_name
        self.position = position
        super().__init__(
            f"Step '{step_name}' at position {position} failed: {cause!r}"
        )


class ValidationError(FlowError):
    """A row failed schema validation under the ``raise`` error policy."""

    def __init__(self, message: str, field: str | None = None):
        self.field = field
        super().__init__(message)
