import re, struct, subprocess, sys
SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"
sec = {}
out = subprocess.run(["readelf","-SW",SO],capture_output=True,text=True).stdout
for m in re.finditer(r"\[\s*\d+\]\s+(\S+)\s+\S+\s+([0-9a-f]+)\s+([0-9a-f]+)\s+([0-9a-f]+)", out):
    sec[m.group(1)] = (int(m.group(2),16), int(m.group(3),16), int(m.group(4),16))
blob = open(SO,"rb").read()
def vread(v,n):
    for a,o,s in sec.values():
        if a <= v < a+s: return blob[o+(v-a):o+(v-a)+n]
    return None
relocs = {}
out = subprocess.run(["readelf","-rW",SO],capture_output=True,text=True).stdout
for line in out.splitlines():
    p = line.split()
    if len(p)>=4 and p[2]=="R_X86_64_RELATIVE":
        relocs[int(p[0],16)] = int(p[3],16)
ro_a,ro_o,ro_s = sec[".rodata"]; dr_a,dr_o,dr_s = sec[".data.rel.ro"]; tx_a,tx_o,tx_s = sec[".text"]
def entry_at(v):
    raw = vread(v,32)
    if raw is None or len(raw)<32: return None
    s_size, = struct.unpack_from("<i",raw,0)
    sub_i,result = struct.unpack_from("<ii",raw,16)
    s_ptr = relocs.get(v+8)
    fn = relocs.get(v+24,0)
    if s_ptr is None:
        if s_size==0 and raw[8:16]==b"\0"*8: s_ptr=0
        else: return None
    if not (0<=s_size<=40): return None
    if s_size>0 and not (ro_a<=s_ptr<ro_a+ro_s): return None
    if not (-1<=sub_i<=1000): return None
    if not (-1000<=result<=1000): return None
    if fn and not (tx_a<=fn<tx_a+tx_s): return None
    return (s_size,s_ptr,sub_i,result,fn)
# scan runs
entries = []
v = dr_a; end = dr_a+dr_s
while v < end:
    e = entry_at(v)
    if e is None: v += 8; continue
    b = vread(e[1],e[0]) if e[0] else b""
    entries.append((b,e[2],e[3],1 if e[4] else 0))
    v += 32
# split on raw-byte sort order + substring_i locality
tables, cur, f_ok, b_ok = [], [], True, True
for e in entries:
    b,sub_i,res,fn = e
    if not cur:
        cur=[e]; f_ok=b_ok=True; continue
    pb = cur[-1][0]
    f = f_ok and pb <= b
    bk = b_ok and pb[::-1] <= b[::-1]
    if (f or bk) and sub_i < len(cur):
        cur.append(e); f_ok,b_ok = f,bk
    else:
        tables.append(cur); cur=[e]; f_ok=b_ok=True
if cur: tables.append(cur)
print(f"{len(tables)} tables", file=sys.stderr)
for i,t in enumerate(tables):
    def dec(b):
        try: return b.decode("utf-8"), "u8"
        except UnicodeDecodeError: return b.decode("latin-1"), "l1"
    samp = [dec(b)[0] for b,*_ in t[:6]]
    encs = {dec(b)[1] for b,*_ in t if b}
    print(f"=== t{i} n={len(t)} enc={''.join(sorted(encs))} sample={samp!r}")
    for b,sub_i,res,fn in t:
        s,enc = dec(b)
        print(f"  {s!r}\t{sub_i}\t{res}\t{fn}")
