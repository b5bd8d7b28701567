"""One-time derivation: find the LFSR/bit conventions that reproduce the
reference's whitening tables, so we can hard-code a self-contained generator."""
import re, numpy as np

src = open('/root/reference/lib/packet_impl.cc').read()

def parse_array(name, src=src):
    m = re.search(name + r"\[\]\s*=\s*\{([^}]*)\}", src)
    return np.array([int(x) for x in re.findall(r"\d+", m.group(1))], dtype=np.int64)

WHITE = parse_array(r"WHITENING_DATA")
IDX = parse_array(r"classic_packet::INDICES")
LE_IDX = parse_array(r"le_packet::INDICES")
PRE = parse_array(r"classic_packet::PREAMBLE_DISTANCE")
BARK = parse_array(r"BARKER_DISTANCE")
print("WHITE len", len(WHITE), "IDX len", len(IDX), "LE_IDX len", len(LE_IDX))

# verify preamble/barker formulas
def pc(x): return bin(x).count('1')
pre_gen = [min(pc(i ^ 0b10101), pc(i ^ 0b01010)) for i in range(32)]
print("preamble formula match:", np.array_equal(pre_gen, PRE))
bark_gen = [min(pc(i ^ 0x27), pc(i ^ 0x58)) for i in range(128)]
print("barker formula match:", np.array_equal(bark_gen, BARK))

# search LFSR conventions for whitening
def stream_msb(init, tap, n=127):
    s = init; out = []
    for _ in range(n):
        o = (s >> 6) & 1
        fb = o ^ ((s >> tap) & 1)
        s = ((s << 1) & 0x7f) | fb
        out.append(o)
    return out

def stream_lsb(init, tap, n=127):
    s = init; out = []
    for _ in range(n):
        o = s & 1
        fb = o ^ ((s >> tap) & 1)
        s = (s >> 1) | (fb << 6)
        out.append(o)
    return out

def rev7(x): return int(bin(x | 0x80)[:2:-1], 2) & 0x7f  # reverse low 7 bits
def inits(clk):
    v = 0x40 | clk
    return {"0x40|clk": v, "rev7(0x40|clk)": rev7(v), "(clk<<1)|1": ((clk << 1) | 1) & 0x7f,
            "rev7((clk<<1)|1)": rev7(((clk << 1) | 1) & 0x7f)}

found = []
for gen_name, gen in [("msb", stream_msb), ("lsb", stream_lsb)]:
    for tap in range(7):
        for init_name in inits(0):
            ok = True
            for clk in range(64):
                st = gen(inits(clk)[init_name], tap)
                want = [WHITE[(IDX[clk] + k) % 127] for k in range(127)]
                if st != want:
                    ok = False; break
            if ok:
                found.append((gen_name, tap, init_name))
print("classic whitening conventions found:", found)

# LE: init from channel index
for gen_name, tap, init_name in found:
    gen = stream_msb if gen_name == "msb" else stream_lsb
    ok = True
    for idx in range(40):
        st = gen(inits(idx)[init_name], tap)
        want = [WHITE[(LE_IDX[idx] + k) % 127] for k in range(127)]
        if st != want:
            ok = False; break
    print("LE matches with", (gen_name, tap, init_name), ":", ok)
