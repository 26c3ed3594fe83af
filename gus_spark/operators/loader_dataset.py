"""Framework adapter: the training-shard loader as an
IterableDataset (PyTorch's streaming-dataset protocol,
torch.utils.data — public API; torchdata's StatefulDataLoader
state_dict convention for resumable streams).

The loader boundary (operators/splits.py) already gives exact
global order, epochs, rank sharding, tombstones, masks, mixtures,
budgets, and exactly-once cursors; what a torch trainer additionally
needs is (a) the DataLoader WORKER dimension folded into the rank
arithmetic and (b) the checkpoint surface expressed as
``state_dict()``/``load_state_dict()``. Both are framework-
independent arithmetic, so this module is fully functional and
fully tested WITHOUT torch installed: when torch is importable the
class genuinely subclasses ``IterableDataset`` (so ``DataLoader``
treats it correctly and skips samplers); otherwise it is a plain
iterable with the same behavior, and ``get_worker_info`` reads as
"no worker context".

Sharding model: a fleet of ``ddp_world_size`` trainer processes,
each running a DataLoader with ``num_workers`` worker processes,
is a flat fleet of ``ddp_world_size × num_workers`` streams — the
effective (rank, world_size) passed to the underlying loader is
``(ddp_rank × num_workers + worker_id,  ddp_world_size ×
num_workers)``. Disjointness and union-exactness then inherit from
the loader's own rank contract. ``num_workers`` must be declared at
construction (torch only reveals it inside the worker; declaring it
keeps rank arithmetic checkable up front), and every component of a
mixture needs at least effective-world-size shard directories (the
loader's shards >= ranks rule).

Checkpointing: ``state_dict()`` returns the last yielded cursor
(the loader's own exactly-once cursor — epoch-composite 4-tuple or
mixture dict). With ``num_workers=0|1`` there is ONE stream per
trainer process and the protocol is complete. With workers > 1 each
worker process iterates its own COPY of this object, so only a
stateful dataloader that calls ``state_dict()`` INSIDE the worker
(the torchdata StatefulDataLoader protocol) can observe worker
progress — this class supports that call pattern (its state is
per-instance), but a plain DataLoader cannot checkpoint worker
streams, and ``state_dict()`` on the main-process object raises in
that configuration rather than returning a cursor that silently
describes no stream.
"""

from __future__ import annotations

try:  # torch is OPTIONAL — the adapter is fully functional without
    from torch.utils.data import IterableDataset as _Base
    from torch.utils.data import get_worker_info
except ImportError:  # pragma: no cover — torch absent in CI env

    _Base = object

    def get_worker_info():  # noqa: D103 — torch-shaped stand-in
        return None


class ShardIterableDataset(_Base):
    """The shard-set / mixture loader under the IterableDataset
    protocol — see the module docstring for the sharding model and
    the checkpoint contract.

    ``source`` is either a shard-set directory (``iter_epochs``
    underneath; ``epochs=`` bounds the loop) or a mixture components
    dict (``iter_mixture`` underneath; scheduling/budget/bundle
    knobs pass through as ``loader_kwargs``). Yields the loader's
    items unchanged — pyarrow record batches (plus name/cursor
    fields); tensor conversion is the training step's concern, where
    the column layout (token_ids, doc_spans, masked_spans) is
    already the attention/loss metadata a trainer consumes."""

    def __init__(
        self,
        source,
        split: str = "train",
        batch_rows: int = 4096,
        ddp_rank: int = 0,
        ddp_world_size: int = 1,
        num_workers: int = 0,
        epochs: int | None = None,
        **loader_kwargs,
    ) -> None:
        if ddp_world_size < 1 or not 0 <= ddp_rank < ddp_world_size:
            raise ValueError(
                f"need 0 <= ddp_rank < ddp_world_size, got "
                f"{ddp_rank}/{ddp_world_size}"
            )
        if num_workers < 0:
            raise ValueError(
                f"num_workers must be >= 0, got {num_workers}"
            )
        self.source = source
        self.split = split
        self.batch_rows = batch_rows
        self.ddp_rank = ddp_rank
        self.ddp_world_size = ddp_world_size
        self.num_workers = num_workers
        self.epochs = epochs
        self.loader_kwargs = loader_kwargs
        self._cursor = None
        self._iterating_worker = None

    # -- sharding arithmetic (pure; unit-tested torch-free) --------
    def _effective(self, worker_id: int) -> tuple[int, int]:
        per = max(1, self.num_workers)
        if not 0 <= worker_id < per:
            raise ValueError(
                f"worker_id {worker_id} outside the declared "
                f"num_workers={self.num_workers}"
            )
        return (
            self.ddp_rank * per + worker_id,
            self.ddp_world_size * per,
        )

    def _worker_id(self) -> int:
        info = get_worker_info()
        if info is None:
            return 0
        if max(1, self.num_workers) != info.num_workers:
            raise ValueError(
                f"DataLoader runs {info.num_workers} workers but "
                f"this dataset declared num_workers="
                f"{self.num_workers} — the rank arithmetic would "
                "shard wrong; keep the two in sync"
            )
        return info.id

    def __iter__(self):
        from gus_spark.operators.splits import iter_epochs, iter_mixture

        worker_id = self._worker_id()
        rank, world = self._effective(worker_id)
        self._iterating_worker = worker_id
        if isinstance(self.source, dict):
            if self.epochs is not None:
                raise ValueError(
                    "epochs= is a single-set knob; a mixture cycles "
                    "components forever — bound it with max_steps= "
                    "or max_tokens= (loader_kwargs)"
                )
            stream = iter_mixture(
                self.source,
                self.split,
                cursor=self._cursor,
                batch_rows=self.batch_rows,
                rank=rank,
                world_size=world,
                **self.loader_kwargs,
            )
            for name, batch, cur in stream:
                self._cursor = cur
                yield name, batch, cur
        else:
            stream = iter_epochs(
                self.source,
                self.split,
                cursor=self._cursor,
                batch_rows=self.batch_rows,
                rank=rank,
                world_size=world,
                epochs=self.epochs,
                **self.loader_kwargs,
            )
            for batch, cur in stream:
                self._cursor = cur
                yield batch, cur

    # -- torchdata StatefulDataLoader convention -------------------
    def state_dict(self) -> dict:
        if self.num_workers > 1 and self._iterating_worker is None:
            raise ValueError(
                "with num_workers > 1 each worker process iterates "
                "its own copy of this dataset — the main-process "
                "object has no stream to checkpoint; use a stateful "
                "dataloader that collects state_dict() inside the "
                "workers (or num_workers <= 1)"
            )
        cur = self._cursor
        if isinstance(cur, tuple):
            cur = list(cur)
        return {"cursor": cur, "worker_id": self._iterating_worker}

    def load_state_dict(self, state: dict) -> None:
        cur = state.get("cursor")
        if isinstance(cur, list):
            cur = tuple(cur)
        self._cursor = cur
