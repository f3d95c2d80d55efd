"""Test configuration: run JAX on a virtual 8-device CPU mesh.

TPU hardware may not be present where tests run; sharding logic is validated
on host devices exactly as the driver's multichip dryrun does.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env pins the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the tunnel sitecustomize force-updates jax_platforms to "axon,cpu" at
# interpreter start, overriding the env var — undo it before any device use
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


class FakeRead:
    """Minimal read-like object for kernel-level tests."""

    def __init__(self, bases, quals, mapping_quality=60, ins_quals=None,
                 gcp=None, name="read"):
        self.bases = bases.encode() if isinstance(bases, str) else bytes(bases)
        self.quals = np.asarray(quals, dtype=np.uint8)
        self.mapping_quality = mapping_quality
        if ins_quals is not None:
            self.ins_quals = np.asarray(ins_quals, dtype=np.uint8)
        if gcp is not None:
            self.gcp = np.asarray(gcp, dtype=np.uint8)
        self.name = name

    def __len__(self):
        return len(self.bases)


@pytest.fixture
def rng():
    return np.random.default_rng(20260817)


def random_read(rng, length, max_qual=40, mapping_quality=60):
    bases = "".join(rng.choice(list("ACGT"), size=length))
    quals = rng.integers(2, max_qual, size=length)
    return FakeRead(bases, quals, mapping_quality)


def mutate(seq, rng, n_snp=0, n_ins=0, n_del=0):
    s = list(seq)
    for _ in range(n_snp):
        i = int(rng.integers(0, len(s)))
        s[i] = rng.choice([b for b in "ACGT" if b != s[i]])
    for _ in range(n_ins):
        i = int(rng.integers(0, len(s)))
        s.insert(i, str(rng.choice(list("ACGT"))))
    for _ in range(n_del):
        i = int(rng.integers(0, len(s) - 1))
        del s[i]
    return "".join(s)
