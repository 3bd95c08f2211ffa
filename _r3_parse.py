"""Parse /tmp/r3_forward_opt.hlo: per-pass gather/sort/while counts + bytes."""
import collections
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_forward_opt.hlo"
txt = open(path).read()

op_pat = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\w+)\[([\d,]*)\][^=]*?"
    r"\b(gather|scatter|sort|dynamic-slice|dynamic-update-slice|while|"
    r"all-gather|all-reduce|dot|convolution|fusion|copy|transpose)\(",
    re.M)
meta_pat = re.compile(r'op_name="([^"]*)"')
src_pat = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')

dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
               "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

kind_counts = collections.Counter()
by_pass = collections.Counter()
bytes_by_pass = collections.Counter()
srcloc = collections.Counter()
srcloc_bytes = collections.Counter()
copy_bytes_by_pass = collections.Counter()

for line in txt.splitlines():
    m = op_pat.search(line)
    if not m:
        continue
    dt, dims, kind = m.groups()
    kind_counts[kind] += 1
    n = 1
    for d_ in dims.split(","):
        if d_:
            n *= int(d_)
    nbytes = n * dtype_bytes.get(dt, 4)
    mm = meta_pat.search(line)
    name = mm.group(1) if mm else "?"
    parts = name.split("/")
    pas = parts[1] if len(parts) > 1 else name
    if kind in ("gather", "sort", "scatter", "while"):
        by_pass[f"{kind}:{pas}"] += 1
        if kind == "gather":
            bytes_by_pass[pas] += nbytes
            sl = src_pat.search(line)
            if sl:
                key = (sl.group(1).split("/")[-1], sl.group(2))
                srcloc[key] += 1
                srcloc_bytes[key] += nbytes
    if kind in ("copy", "transpose"):
        copy_bytes_by_pass[pas] += nbytes

print("== op kind counts (optimized) ==")
for k, v in kind_counts.most_common():
    print(f"  {k:24s} {v}")
print("\n== gathers/sorts/whiles by pass ==")
for k, v in sorted(by_pass.items()):
    print(f"  {k:44s} {v}")
print("\n== gather OUTPUT bytes by pass (MB) ==")
for k, v in sorted(bytes_by_pass.items(), key=lambda x: -x[1]):
    print(f"  {k:30s} {v/1e6:9.2f}")
print("\n== copy+transpose OUTPUT bytes by pass (MB, top 12) ==")
for k, v in sorted(copy_bytes_by_pass.items(), key=lambda x: -x[1])[:12]:
    print(f"  {k:30s} {v/1e6:9.2f}")
print("\n== duplicated gather source lines (x>1), with total MB ==")
for (f_, l_), c in sorted(srcloc.items(), key=lambda x: -srcloc_bytes[x[0]]):
    if c > 1:
        print(f"  {f_}:{l_:4s}  x{c:3d}  {srcloc_bytes[(f_, l_)]/1e6:9.2f} MB")
print("\n== top single gather source lines by bytes ==")
for (f_, l_), b in sorted(srcloc_bytes.items(), key=lambda x: -x[1])[:15]:
    print(f"  {f_}:{l_:4s}  x{srcloc[(f_, l_)]:3d}  {b/1e6:9.2f} MB")
