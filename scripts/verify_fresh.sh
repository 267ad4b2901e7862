#!/bin/bash
# Fresh-corpus differential verification vs .refsrc/ibwa (the /verify recipe).
# Generates a genome + SE/PE reads with a seeded RNG, then byte-compares
# index artifacts, .sai, samse and sampe SAM across both pipelines.
# Env: VDIR (workdir, default /tmp/verify_r5), SEED, NREADS.
set -euo pipefail
cd "$(dirname "$0")/.."
REPO=$PWD
VDIR=${VDIR:-/tmp/verify_r5}
SEED=${SEED:-20260819}
NREADS=${NREADS:-3000}
export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
export IBWA_HOST_FRAC=${IBWA_HOST_FRAC:-0.0}   # route reads through the jax engine
mkdir -p "$VDIR"
python - "$VDIR" "$SEED" "$NREADS" <<'EOF'
import sys, numpy as np, pathlib
vdir, seed, nreads = pathlib.Path(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rng = np.random.default_rng(seed)
bases = np.array(list("ACGT"))
ctgs = []
for i, n in enumerate((300_000, 150_000)):
    s = rng.integers(0, 4, n)
    seq = bases[s].copy()
    # N runs + lowercase patches
    for _ in range(4):
        p = rng.integers(0, n - 60)
        seq[p:p + rng.integers(5, 50)] = "N"
    ctgs.append((f"ctg{i}", "".join(seq)))
with open(vdir / "genome.fa", "w") as f:
    for name, seq in ctgs:
        f.write(f">{name}\n")
        for j in range(0, len(seq), 70):
            f.write(seq[j:j + 70] + "\n")
# SE + PE reads with errors and occasional indels
comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
def rc(s): return "".join(comp[c] for c in reversed(s))
def mutate(r):
    r = list(r)
    for _ in range(rng.integers(0, 3)):
        p = rng.integers(0, len(r)); r[p] = "ACGT"[rng.integers(0, 4)]
    if rng.random() < 0.05 and len(r) > 30:
        p = rng.integers(5, len(r) - 5)
        if rng.random() < 0.5: del r[p]
        else: r.insert(p, "ACGT"[rng.integers(0, 4)])
    return "".join(r)
L = 70
with open(vdir / "se.fq", "w") as f:
    for i in range(nreads):
        name, seq = ctgs[rng.integers(0, len(ctgs))]
        p = rng.integers(0, len(seq) - L)
        r = mutate(seq[p:p + L])
        if rng.random() < 0.5: r = rc(r)
        f.write(f"@se{i}\n{r}\n+\n{'I' * len(r)}\n")
with open(vdir / "pe1.fq", "w") as f1, open(vdir / "pe2.fq", "w") as f2:
    for i in range(nreads):
        name, seq = ctgs[rng.integers(0, len(ctgs))]
        isz = int(rng.normal(250, 30))
        isz = max(160, min(isz, 400))
        p = rng.integers(0, len(seq) - isz)
        r1 = mutate(seq[p:p + L])
        r2 = mutate(rc(seq[p + isz - L:p + isz]))
        f1.write(f"@pe{i}\n{r1}\n+\n{'I' * len(r1)}\n")
        f2.write(f"@pe{i}\n{r2}\n+\n{'I' * len(r2)}\n")
print("corpus written to", vdir)
EOF
cp "$VDIR/genome.fa" "$VDIR/genome_ref.fa"
echo "== index =="
python -m ibwa_tpu index "$VDIR/genome.fa" 2>/dev/null
"$REPO/.refsrc/ibwa" index "$VDIR/genome_ref.fa" 2>/dev/null
for ext in pac rpac ann amb bwt rbwt sa rsa; do
  cmp "$VDIR/genome.fa.$ext" "$VDIR/genome_ref.fa.$ext"
done
echo index OK
echo "== aln (SE + PE, jax engine) =="
for fq in se pe1 pe2; do
  python -m ibwa_tpu aln "$VDIR/genome.fa" "$VDIR/$fq.fq" > "$VDIR/$fq.sai" 2>/dev/null
  "$REPO/.refsrc/ibwa" aln "$VDIR/genome_ref.fa" "$VDIR/$fq.fq" > "$VDIR/${fq}_ref.sai" 2>/dev/null
  cmp "$VDIR/$fq.sai" "$VDIR/${fq}_ref.sai"
  echo "aln $fq OK"
done
echo "== samse =="
python -m ibwa_tpu samse "$VDIR/genome.fa" "$VDIR/se.sai" "$VDIR/se.fq" 2>/dev/null | grep -v '^@PG' > "$VDIR/se_ours.sam"
"$REPO/.refsrc/ibwa" samse "$VDIR/genome_ref.fa" "$VDIR/se_ref.sai" "$VDIR/se.fq" 2>/dev/null | grep -v '^@PG' > "$VDIR/se_ref.sam"
diff -q "$VDIR/se_ours.sam" "$VDIR/se_ref.sam"
echo samse OK
echo "== sampe =="
python -m ibwa_tpu sampe "$VDIR/genome.fa" "$VDIR/pe1.sai" "$VDIR/pe2.sai" "$VDIR/pe1.fq" "$VDIR/pe2.fq" 2>/dev/null | grep -v '^@PG' > "$VDIR/pe_ours.sam"
"$REPO/.refsrc/ibwa" sampe "$VDIR/genome_ref.fa" "$VDIR/pe1_ref.sai" "$VDIR/pe2_ref.sai" "$VDIR/pe1.fq" "$VDIR/pe2.fq" 2>/dev/null | grep -v '^@PG' > "$VDIR/pe_ref.sam"
diff -q "$VDIR/pe_ours.sam" "$VDIR/pe_ref.sam"
echo sampe OK
echo "ALL SURFACES BYTE-EXACT"
