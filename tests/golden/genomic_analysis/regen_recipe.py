import random
random.seed(42)
L = 2000
ref = "".join(random.choice("ACGT") for _ in range(L))
ref = ref[:500] + "N" + ref[501:]          # wildcard in reference
with open("/tmp/gvc/golden_ref.fasta", "w") as f:
    f.write(ref)                            # raw single-line, no header

def subst(seq, i, c):
    return seq[:i] + c + seq[i+1:]

rows = []
def add(pos, cigar, seq, mapq=60):
    rows.append(f"r{len(rows)}\t0\tchrT\t{pos}\t{mapq}\t{cigar}\t*\t0\t0\t{seq}\t*\tNM:i:0")

# pos is 1-based; ref window at pos covers ref[pos-1 : pos-1+82]
def win(pos, n):
    return ref[pos-1:pos-1+n]

# 1) plain mismatches (case 1 seek: same window twice)
s = win(1, 20); add(1, "20M", subst(s, 5, "A" if s[5] != "A" else "G"))
add(1, "20M", subst(s, 7, "T" if s[7] != "T" else "C"))
# 2) case-2 overlap seek + mismatch
s = win(40, 30); add(40, "30M", subst(s, 3, "A" if s[3] != "A" else "G"))
# 3) insertion mid-read
s = win(60, 20); add(60, "10M3I10M", s[:10] + "GGG" + s[10:])
# 4) insertion at refPos==0 (CIGAR starts with I)
s = win(90, 15); add(90, "4I15M", "TTTT" + s)
# 5) deletion mid-read
s = win(120, 23); add(120, "10M3D10M", s[:10] + s[13:])
# 6) deletion at refPos==0
s = win(150, 20); add(150, "5D15M", s[5:])
# 7) soft+hard clips with mismatch
s = win(200, 20); add(200, "3H5S20M2S1H", "CCCCC" + subst(s, 2, "A" if s[2] != "A" else "G") + "AA")
# 8) read with N (wildcard both sides)
s = win(240, 20); add(240, "20M", subst(s, 4, "N"))
# 9) read over the reference N at pos 501
s = win(480, 40); add(480, "40M", s.replace("N", "A"))
# 10) case-3 gap seek, low-mapq skipped read in between
add(700, "20M", win(700, 20), mapq=10)
s = win(900, 20); add(900, "20M", subst(s, 0, "A" if s[0] != "A" else "G"))
# 11) duplicate variant (set dedup) at same pos
add(900, "20M", subst(s, 0, "A" if s[0] != "A" else "G"))
# 12) long read, 82-clamp: 100M CIGAR only processes 82
s = win(1000, 100); add(1000, "100M", subst(subst(s, 2, "N" if s[2] != "N" else "A"), 90, "A" if s[90] != "A" else "G"))
# 13) many reads to trip BATCH_SIZE flush (>100 calls)
p = 1100
for i in range(110):
    s = win(p, 20)
    add(p, "20M", subst(s, i % 20, "A" if s[i % 20] != "A" else "G"))
    p += 3
with open("/tmp/gvc/golden.sam", "w") as f:
    f.write("\n".join(rows) + "\n")
print(len(rows), "reads")
