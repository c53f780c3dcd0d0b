"""Stream control-plane semantics (F8 panic abort, §2.9).

The reference cancels the whole flow when an RPC panic message arrives
(WebSocketFlow.kt:46-48, RpcError.isPanic).  In Structured Streaming the data
plane can't stop the query directly; the abort path is: detect in foreachBatch
→ raise → query terminates with the exception (surfaced by awaitTermination).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PanicAbort(RuntimeError):
    """Raised when a panic message reaches the sink — terminates the query."""


def panic_guard(batch_df: DataFrame, msg_class_col: str = "msg_class") -> None:
    if msg_class_col not in batch_df.columns:
        return
    n = batch_df.filter(F.col(msg_class_col) == "panic").limit(1).count()
    if n:
        raise PanicAbort("panic message received — aborting stream (F8)")


def guarded_foreach_batch(
    process: Callable[[DataFrame, int], None], msg_class_col: str = "msg_class"
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch body with the panic check."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        panic_guard(batch_df, msg_class_col)
        process(batch_df, batch_id)

    return run
