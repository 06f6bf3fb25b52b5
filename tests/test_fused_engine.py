"""Bit-exactness of the fused Pallas blind-rotate engine.

The 'fused' engine (Toeplitz-strip MXU matmuls, VMEM-resident CMUX back
half — fhe/pallas_kernels.py) must produce bit-identical ciphertexts to the
pure-XLA 'conv' engine for every drop_limbs setting, and the Pallas strip
builder must match the XLA tile/reshape reference.  Runs in Pallas
interpret mode on the CPU mesh.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dct_cryptonets_tpu.fhe import keys as K
from dct_cryptonets_tpu.fhe import pbs as P
from dct_cryptonets_tpu.fhe import torus as T
from dct_cryptonets_tpu.fhe.pallas_kernels import build_bigd_strips
from dct_cryptonets_tpu.fhe.params import TEST_PARAMS as PAR

U64 = np.uint64


@pytest.fixture(scope="module")
def material():
    ck = K.keygen(PAR, seed=0)
    sk = K.make_server_keys(ck, seed=1)
    return ck, P.preprocess_server_keys(sk)


def test_bigd_strip_builder_matches_xla_reference():
    rng = np.random.default_rng(11)
    k, N, levels = PAR.glwe_dim, PAR.poly_size, PAR.pbs_levels
    rows = (k + 1) * levels
    bsk_i = jnp.asarray(rng.integers(-128, 128, (rows, k + 1, 2 * N, 8),
                                     dtype=np.int8))
    for drop in (0, 3):
        ref = P.build_bigd(bsk_i, k, levels, N, drop)
        got = build_bigd_strips(P._bigd_rows(bsk_i, k, levels, N, drop))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("drop", [0, 2])
def test_fused_engine_bit_exact_vs_conv(material, drop):
    ck, dsk = material
    rng = np.random.default_rng(21 + drop)
    M, bits = 8, 3
    msgs = rng.integers(0, 2 ** bits, M)
    ct = K.encrypt_lwe(ck, msgs.astype(U64) << U64(64 - bits - 1), rng,
                       key=ck.big_lwe_key, noise_log2=PAR.glwe_noise_log2)
    tables = jnp.asarray(rng.integers(-4, 4, (M, 2 ** bits)), jnp.int32)
    ref = P.bootstrap(T.from_u64(ct), tables, dsk, PAR, 60,
                      drop_limbs=drop, engine="conv")
    got = P.bootstrap(T.from_u64(ct), tables, dsk, PAR, 60,
                      drop_limbs=drop, engine="fused")
    np.testing.assert_array_equal(T.to_u64(got), T.to_u64(ref))


def test_fused_engine_unaligned_batch(material):
    """Sample counts not aligned to the fused kernel's manual-DMA tiling
    (multiples of 8 / block_m) must pad internally and still be bit-exact —
    on real TPU hardware an M=13 batch previously failed Mosaic compilation
    ('Slice shape along dimension 1 must be aligned to tiling (8)')."""
    ck, dsk = material
    rng = np.random.default_rng(77)
    M, bits = 13, 3
    msgs = rng.integers(0, 2 ** bits, M)
    ct = K.encrypt_lwe(ck, msgs.astype(U64) << U64(64 - bits - 1), rng,
                       key=ck.big_lwe_key, noise_log2=PAR.glwe_noise_log2)
    tables = jnp.asarray(rng.integers(-4, 4, (M, 2 ** bits)), jnp.int32)
    ref = P.bootstrap(T.from_u64(ct), tables, dsk, PAR, 60, engine="conv")
    got = P.bootstrap(T.from_u64(ct), tables, dsk, PAR, 60, engine="fused")
    assert got.hi.shape == ref.hi.shape
    np.testing.assert_array_equal(T.to_u64(got), T.to_u64(ref))
