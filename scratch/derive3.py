import re, numpy as np, itertools
src = open('/root/reference/lib/packet_impl.cc').read()
def parse_array(name, src=src):
    m = re.search(name + r"\[\]\s*=\s*\{([^}]*)\}", src)
    return np.array([int(x) for x in re.findall(r"\d+", m.group(1))], dtype=np.int64)
WHITE = parse_array(r"WHITENING_DATA"); IDX = parse_array(r"classic_packet::INDICES")
LE_IDX = parse_array(r"le_packet::INDICES")

want = {clk: [int(WHITE[(IDX[clk]+k)%127]) for k in range(20)] for clk in range(64)}

def try_conv(shift_dir, out_bits, tap, init_fn, warmup):
    for clk in range(64):
        s = init_fn(clk)
        if s == 0: return False
        out = []
        for step in range(warmup + 20):
            if shift_dir == 'L':
                o = (s >> 6) & 1
                fb = o ^ ((s >> tap) & 1)
                s2 = ((s << 1) & 0x7f) | fb
            else:
                o = s & 1
                fb = o ^ ((s >> tap) & 1)
                s2 = (s >> 1) | (fb << 6)
            ob = 0
            for b in out_bits: ob ^= (s >> b) & 1
            if step >= warmup: out.append(ob)
            s = s2
        if out != want[clk]: return False
    return True

def rev6(x): return sum(((x >> i) & 1) << (5 - i) for i in range(6))
init_fns = {
    "0x40|clk": lambda c: 0x40 | c,
    "0x40|rev6(clk)": lambda c: 0x40 | rev6(c),
    "(clk<<1)|1": lambda c: ((c << 1) | 1) & 0x7f,
    "(rev6(clk)<<1)|1": lambda c: ((rev6(c) << 1) | 1) & 0x7f,
}
found = []
single = [(b,) for b in range(7)]
pairs = [(a,b) for a in range(7) for b in range(a+1,7)]
for sd in 'LR':
    for ob in single + pairs:
        for tap in range(7):
            for iname, ifn in init_fns.items():
                for warm in range(8):
                    if try_conv(sd, ob, tap, ifn, warm):
                        found.append((sd, ob, tap, iname, warm))
print("found:", found)
