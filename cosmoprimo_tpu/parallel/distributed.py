"""Process-parallel communication for sampling fan-out.

Replaces the reference's mpi4py backend (emulators/tools/mpi.py: real comm
or fake single-rank fallback) with ``jax.distributed`` multi-host
primitives and a :class:`FakeComm` that runs everything serially in a single
process, so all code paths work on one chip with zero extra deps.
"""

import numpy as np

import jax


class FakeComm(object):
    """Single-process stand-in with the subset of the MPI interface used by
    the samplers: rank/size, bcast, (all)gather, scatter, barrier."""

    rank = 0
    size = 1

    def Get_rank(self):
        return self.rank

    def Get_size(self):
        return self.size

    def bcast(self, value, root=0):
        return value

    def gather(self, value, root=0):
        return [value]

    def allgather(self, value):
        return [value]

    def scatter(self, values, root=0):
        if values is None:
            return None
        assert len(values) == 1
        return values[0]

    def barrier(self):
        pass

    barrier_idle = barrier

    def reduce_sum(self, value, root=0):
        return value

    def allreduce_sum(self, value):
        return value

    def send(self, value, dest=0, tag=0):
        """Point-to-point send (reference tools/mpi.py:438-479). Single rank:
        queue locally so a matching recv() returns it."""
        assert dest == 0
        self._queue = getattr(self, '_queue', {})
        self._queue.setdefault(tag, []).append(value)

    def recv(self, source=0, tag=0):
        assert source == 0
        return self._queue[tag].pop(0)


class JaxDistributedComm(object):
    """Multi-host communication built on jax.distributed +
    multihost_utils (DCN collectives). Each host is one 'rank'.

    ``multihost_utils.broadcast_one_to_all`` / ``process_allgather`` require
    every host to contribute arrays of identical shape and dtype, which a
    generic comm cannot guarantee (non-root ranks pass None to bcast,
    gathered objects differ per rank). All object-valued collectives
    therefore ride a two-step bytes protocol: (1) broadcast/allgather the
    pickled payload *length* (a fixed-shape scalar every rank can produce),
    (2) broadcast/allgather the max-length-padded uint8 payload, then
    unpickle. Point-to-point send/recv (reference tools/mpi.py:438-511) maps
    onto the same broadcast — DCN has no p2p primitive — filtered by rank.
    """

    def __init__(self):
        self.rank = jax.process_index()
        self.size = jax.process_count()
        self._mailbox = {}  # size-1 local p2p queue (tag -> values)

    def Get_rank(self):
        return self.rank

    def Get_size(self):
        return self.size

    def _bcast_array(self, value, root=0):
        from jax.experimental import multihost_utils
        return multihost_utils.broadcast_one_to_all(value, is_source=self.rank == root)

    def bcast(self, value, root=0):
        import pickle
        if self.rank == root:
            buf = np.frombuffer(pickle.dumps(value), dtype=np.uint8)
            nbytes = np.asarray(len(buf), dtype=np.int64)
        else:
            buf = None
            nbytes = np.asarray(0, dtype=np.int64)
        nbytes = int(self._bcast_array(nbytes, root=root))
        payload = np.zeros(nbytes, dtype=np.uint8)
        if self.rank == root:
            payload[:] = buf
        out = np.asarray(self._bcast_array(payload, root=root), dtype=np.uint8)
        return pickle.loads(out.tobytes())

    def allgather(self, value):
        import pickle
        from jax.experimental import multihost_utils
        buf = np.frombuffer(pickle.dumps(value), dtype=np.uint8)
        sizes = multihost_utils.process_allgather(np.asarray(len(buf), dtype=np.int64))
        nmax = int(np.max(sizes))
        payload = np.zeros(nmax, dtype=np.uint8)
        payload[:len(buf)] = buf
        out = np.asarray(multihost_utils.process_allgather(payload), dtype=np.uint8)
        return [pickle.loads(out[i, :int(sizes[i])].tobytes()) for i in range(self.size)]

    def gather(self, value, root=0):
        gathered = self.allgather(value)
        return gathered if self.rank == root else None

    def scatter(self, values, root=0):
        # every host extracts its own slice from the broadcast list
        values = self.bcast(values if self.rank == root else None, root=root)
        return values[self.rank]

    def send(self, value, dest=0, tag=0):
        """Point-to-point over the broadcast collective: all ranks must
        participate (the source calls send, every other rank calls recv with
        the matching source) — same collective-participation requirement as
        the underlying DCN primitives. The (dest, tag) metadata rides along:
        bystander ranks (dest != rank) get None back, and the true
        destination fails loudly on a tag mismatch instead of
        cross-delivering. At size 1, send/recv degrade to a local mailbox
        (like FakeComm)."""
        if self.size == 1:
            self._mailbox.setdefault(tag, []).append(value)
            return
        self.bcast((dest, tag, value), root=self.rank)

    def recv(self, source=0, tag=0):
        if self.size == 1:
            box = getattr(self, '_mailbox', {}).get(tag)
            return box.pop(0) if box else None
        packet = self.bcast(None, root=source)
        if packet is None:  # source broadcast nothing (no paired send)
            return None
        dest, sent_tag, value = packet
        if dest != self.rank:
            return None  # bystander rank participating in the collective
        if sent_tag != tag:
            raise RuntimeError(
                f'mismatched point-to-point pairing: rank {source} sent to rank {dest} '
                f'with tag {sent_tag}, but rank {self.rank} expected tag {tag}')
        return value

    def barrier(self):
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices('cosmoprimo_tpu_barrier')

    barrier_idle = barrier

    def allreduce_sum(self, value):
        return sum(self.allgather(value))

    def reduce_sum(self, value, root=0):
        total = self.allreduce_sum(value)
        return total if self.rank == root else None


def get_comm():
    """The best available communicator: multi-host if jax.distributed is
    initialized with more than one process, else the serial fallback."""
    try:
        if jax.process_count() > 1:
            return JaxDistributedComm()
    except Exception:
        pass
    return FakeComm()


def split_ranks(nitems, rank, size):
    """Indices of the items this rank owns (block distribution)."""
    return list(range(rank * nitems // size, (rank + 1) * nitems // size))


def bcast_seed(seed=None, comm=None, size=None):
    """Seed array broadcast from rank 0 (reference tools/mpi.py:512-535):
    every process gets the same pool to draw per-task seeds from."""
    comm = comm if comm is not None else get_comm()
    if comm.Get_rank() == 0:
        seeds = np.random.RandomState(seed).randint(0, high=0xFFFF, size=size)
    else:
        seeds = None
    return comm.bcast(seeds, root=0)


def set_common_seed(seed=None, comm=None):
    """Seed numpy identically on all processes (reference tools/mpi.py:538-563)."""
    comm = comm if comm is not None else get_comm()
    seed = comm.bcast(int(np.random.RandomState(seed).randint(0, high=0xFFFFFFFF))
                      if comm.Get_rank() == 0 else None, root=0)
    np.random.seed(seed)
    return seed


def set_independent_seed(seed=None, comm=None, size=10000):
    """Seed numpy differently (but reproducibly) per process (reference
    tools/mpi.py:566-591)."""
    comm = comm if comm is not None else get_comm()
    seed = bcast_seed(seed=seed, comm=comm, size=size)[comm.Get_rank() % size]
    np.random.seed(seed)
    return seed
