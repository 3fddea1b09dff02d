"""Malformed-payload contract for the media decoders.

A 100 TB scraped corpus WILL contain truncated, bit-flipped and
adversarially weird media payloads. The decode stages survive them by
contract: every decoder raises ValueError (malformed) or
NotImplementedError (recognized but unsupported) — never a stray
IndexError/KeyError/zlib.error that would fail the whole Ray batch.
Fuzzing with mutated valid payloads surfaced exactly those escapes
(803 GIF IndexErrors, JPEG KeyError/StopIteration/OverflowError, PNG
zlib.error in 9k trials); the guard converts them at the decoder
boundary so MediaDecoder's (ValueError, NotImplementedError) catch is
airtight. MemoryError and system exceptions still propagate — resource
exhaustion must not be silently recorded as a bad payload.
"""

from __future__ import annotations

import functools
import zlib

# exception classes a parser bug-on-garbage manifests as
_MALFORMED = (
    IndexError,
    KeyError,
    StopIteration,
    OverflowError,
    ZeroDivisionError,
    TypeError,
    UnicodeDecodeError,
    zlib.error,
)

# pixel-count ceiling: a mutated header must not become an allocation
# bomb (2^28 px ≈ 768 MB of RGB float — far above any real payload here,
# far below an OOM)
MAX_PIXELS = 1 << 28


def check_dims(w: int, h: int, what: str) -> None:
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError(f"implausible {what} dimensions {w}x{h}")


def malformed_guard(fmt: str):
    """Decorator: normalize parser-bug-on-garbage exceptions to
    ValueError('malformed <fmt> payload ...')."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(data, *args, **kwargs):
            try:
                return fn(data, *args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except _MALFORMED as e:
                raise ValueError(
                    f"malformed {fmt} payload ({type(e).__name__}: {e})"
                ) from e

        return wrapped

    return deco
