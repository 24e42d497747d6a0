#!/usr/bin/env python3
"""Generate golden expected outputs for the 10 reference lab queries by
independently executing the reference MapReduce semantics (studied from
/root/reference/lab*/<Job>.sh embedded Java) over the reference's own
datasets. Output: src/test/resources/golden/labN.txt with sorted
"key\tvalue" lines (Hadoop 1-reducer TextOutputFormat contract, S2/S3).

Documented canonicalization (SURVEY.md S6): where the reference's
reduce-side value order is nondeterministic (lab4/lab9 list joins,
lab11 ties), goldens use sorted order / smallest-witness ties — the
engine's canonical policy.
"""
import os, re

SRC = "/root/repo/src/test/resources/labdata"
OUT = "/root/repo/src/test/resources/golden"
os.makedirs(OUT, exist_ok=True)

def read_lines(name):
    with open(os.path.join(SRC, name), encoding="utf-8") as f:
        return [l.rstrip("\n") for l in f]

def write(lab, pairs):
    # Hadoop Text key sort: lexicographic by UTF-8 bytes
    with open(os.path.join(OUT, f"{lab}.txt"), "w", encoding="utf-8") as f:
        for k, v in sorted(pairs, key=lambda kv: (kv[0].encode(), )):
            f.write(f"{k}\t{v}\n")

def parse_int(s):
    # Java Integer.parseInt: no floats, no spaces; python int(s) is close
    # enough for these datasets but reject floats explicitly
    if re.fullmatch(r"[+-]?\d+", s.strip()) is None:
        raise ValueError(s)
    return int(s.strip())

# lab2 WordCount: StringTokenizer = whitespace tokens, sum per token
counts = {}
for line in read_lines("input2.txt"):
    for tok in line.split():
        counts[tok] = counts.get(tok, 0) + 1
write("lab2", [(k, str(v)) for k, v in counts.items()])

# lab3 HighestTemperature: split \s+, parts==2, parseInt guard, max per year
best = {}
for line in read_lines("Temperature.txt"):
    parts = line.strip().split()
    if len(parts) != 2:
        continue
    try:
        t = parse_int(parts[1])
    except ValueError:
        continue
    y = parts[0]
    best[y] = max(best.get(y, -2**31), t)
write("lab3", [(k, str(v)) for k, v in best.items()])

# lab4 StudentGrades: csv 3 cols, grade ladder, join "subject:grade" with
# ", " (canonical: sorted)
grades = {}
for line in read_lines("input4.txt"):
    tokens = line.split(",")
    if len(tokens) != 3:
        continue
    m = parse_int(tokens[2])
    g = "A" if m >= 90 else "B" if m >= 80 else "C" if m >= 70 else "D" if m >= 60 else "F"
    grades.setdefault(tokens[0], []).append(f"{tokens[1]}:{g}")
write("lab4", [(k, ", ".join(sorted(v))) for k, v in grades.items()])

# lab5 MatrixMultiplication: COO "M,r,c,v" with K=2; C[i,j]=sum A[i,k]*B[k,j]
A, B = {}, {}
for line in read_lines("input5.txt"):
    t = line.split(",")
    if len(t) < 4:
        continue
    m, r, c, v = t[0], parse_int(t[1]), parse_int(t[2]), parse_int(t[3])
    (A if m == "A" else B)[(r, c)] = v
K = 2
cells = []
for i in range(K):
    for j in range(K):
        s = sum(A.get((i, k), 0) * B.get((k, j), 0) for k in range(K))
        cells.append((f"{i},{j}", str(s)))
write("lab5", cells)

# lab6 MaxElectricityConsumption: header 'year', row max over cols 1..n-2
# (last col = annual average, excluded), whole row dropped on any bad int
best6 = {}
for line in read_lines("electric_consumption.txt"):
    parts = line.strip().split()
    if not parts or parts[0].lower() == "year":
        continue
    try:
        mx = max(parse_int(p) for p in parts[1:-1])
    except ValueError:
        continue
    y = parts[0]
    best6[y] = max(best6.get(y, -2**31), mx)
write("lab6", [(k, str(v)) for k, v in best6.items()])

# lab7 WeatherAnalyzer: classify maxTemp>=30 Shiny else Cool; identity reduce
rows7 = []
for line in read_lines("input7.txt"):
    line = line.strip()
    if not line:
        continue
    parts = line.split()
    if len(parts) < 2 or parts[0].lower() == "date":
        continue
    try:
        mt = parse_int(parts[1])
    except ValueError:
        continue
    rows7.append((parts[0], "Shiny" if mt >= 30 else "Cool"))
write("lab7", rows7)

# lab8 ProductSalesAnalyzer: skip 'Transaction' header, country=col 8, count
c8 = {}
for line in read_lines("productsSold_dataset.txt"):
    if line.startswith("Transaction"):
        continue
    fields = line.split(",")
    if len(fields) > 8:
        country = fields[8].strip()
        c8[country] = c8.get(country, 0) + 1
write("lab8", [(k, str(v)) for k, v in c8.items()])

# lab9 MovieTagsAnalyzer: '::' records, fields>=3, join tags (canonical: sorted)
tags = {}
for line in read_lines("input9.txt"):
    fields = line.split("::")
    if len(fields) >= 3:
        tags.setdefault(fields[1].strip(), []).append(fields[2].strip())
write("lab9", [(k, ", ".join(sorted(v))) for k, v in tags.items()])

# lab10 BookPublicationFrequency: skip 'ISBN' header, naive comma split,
# year=col 3, count
c10 = {}
for line in read_lines("Books-mini.csv"):
    if line.startswith("ISBN"):
        continue
    fields = line.split(",")
    if len(fields) > 3:
        y = fields[3].strip()
        c10[y] = c10.get(y, 0) + 1
write("lab10", [(k, str(v)) for k, v in c10.items()])

# lab11 UberTripAnalyzer: skip header, per date argmax trips
# (canonical tie: smallest base; reference is first-seen)
best11 = {}
for line in read_lines("uber_dataset.csv"):
    if line.startswith("dispatching_base_number"):
        continue
    fields = line.split(",")
    if len(fields) < 4:
        continue
    base, date = fields[0].strip(), fields[1].strip()
    try:
        trips = parse_int(fields[3])
    except ValueError:
        continue
    cur = best11.get(date)
    if cur is None or trips > cur[0] or (trips == cur[0] and base < cur[1]):
        best11[date] = (trips, base)
write("lab11", [(d, f"{b}\t{t}") for d, (t, b) in best11.items()])

print("golden files written:", sorted(os.listdir(OUT)))
