"""Fast expand5 kernel compile + correctness check on synthetic tokens."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import numpy as np
import jax.numpy as jnp
from jdeflate_tpu.ops import expand5 as ex5

rng = np.random.default_rng(7)
L = 16384
OC = 1 << 18                  # 256 KiB
tok = np.zeros((L, 32), np.uint32)
outlen = np.zeros(L, np.int32)
total = 0
ref = bytearray()
for i in range(L):
    if total >= OC - 600:
        break
    s = 0
    col = 0
    n = int(rng.integers(1, 4))
    for _ in range(n):
        if col >= 8:          # respect S_SLICE (spill lanes tested later)
            break
        if total + s < 8 or rng.random() < 0.55:
            k = int(rng.integers(1, 4))
            for _ in range(k):
                if col >= 8:
                    break
                b = int(rng.integers(0, 256))
                tok[i, col] = (1 << 30) | b
                ref.append(b)
                col += 1
                s += 1
        else:
            d = int(rng.integers(1, min(total + s, 32768) + 1))
            ln = int(rng.integers(3, 259))
            tok[i, col] = (2 << 30) | ln | ((d - 1) << 9)
            start = len(ref) - d
            for j in range(ln):
                ref.append(ref[start + j])
            col += 1
            s += ln
    outlen[i] = s
    total += s

halo = np.zeros(ex5.HALO, np.uint8)
print(f"synthetic: total={total} tokens", flush=True)
out, produced, err = ex5.expand_tokens(
    jnp.asarray(tok), jnp.asarray(outlen), jnp.asarray(halo), OC)
a = np.asarray(out[:total])
r = np.frombuffer(bytes(ref[:total]), np.uint8)
mism = int(np.sum(a != r))
print(f"produced={int(produced)} (want {total}) err={int(err)} "
      f"mismatch={mism}", flush=True)
if mism:
    i = int(np.argmax(a != r))
    print("first mismatch at", i, r[max(0, i-4):i+8], a[max(0, i-4):i+8],
          flush=True)

# halo-referencing case
halo2 = rng.integers(0, 256, ex5.HALO).astype(np.uint8)
tok2 = np.zeros((128, 32), np.uint32)
ol2 = np.zeros(128, np.int32)
ref2 = bytearray()
t2 = 0
hist = list(halo2)
for i in range(64):
    d = int(rng.integers(1, 32768))
    ln = int(rng.integers(3, 259))
    tok2[i, 0] = (2 << 30) | ln | ((d - 1) << 9)
    b = int(rng.integers(0, 256))
    tok2[i, 1] = (1 << 30) | b
    for j in range(ln):
        hist.append(hist[-d])
    hist.append(b)
    ref2 += bytes(hist[-(ln + 1):])
    ol2[i] = ln + 1
    t2 += ln + 1
out2, p2, e2 = ex5.expand_tokens(
    jnp.asarray(tok2), jnp.asarray(ol2), jnp.asarray(halo2), 1 << 15)
a2 = np.asarray(out2[:t2])
r2 = np.frombuffer(bytes(ref2), np.uint8)
m2 = int(np.sum(a2 != r2))
print(f"halo case: produced={int(p2)} (want {t2}) err={int(e2)} "
      f"mismatch={m2}", flush=True)

# spill case: lanes with >8 tokens ride the spill pass (exact, err==0)
tok3 = np.zeros((128, 32), np.uint32)
ol3 = np.zeros(128, np.int32)
ref3 = bytearray()
for lane in range(3):
    for c in range(14):
        b = 60 + lane * 16 + c
        tok3[lane, c] = (1 << 30) | b
        ref3.append(b)
    ol3[lane] = 14
o3, p3, e3 = ex5.expand_tokens(
    jnp.asarray(tok3), jnp.asarray(ol3), jnp.asarray(halo), 1 << 12)
m3 = int(np.sum(np.asarray(o3[:42]) != np.frombuffer(bytes(ref3), np.uint8)))
print(f"spill case err={int(e3)} (want 0) mismatch={m3} (want 0)",
      flush=True)
