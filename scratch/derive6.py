import re, numpy as np
src = open('/root/reference/lib/packet_impl.cc').read()
def parse_array(name, src=src):
    m = re.search(name + r"\[\]\s*=\s*\{([^}]*)\}", src)
    return np.array([int(x) for x in re.findall(r"\d+", m.group(1))], dtype=np.int64)
WHITE = parse_array(r"WHITENING_DATA"); LE_IDX = parse_array(r"le_packet::INDICES")
def galois_stream(init, n):
    s = init; out = []
    for _ in range(n):
        o = (s >> 6) & 1
        s = ((s << 1) & 0x7f) ^ (0x11 if o else 0)
        out.append(o)
    return out
def rev6(x): return sum(((x >> i) & 1) << (5 - i) for i in range(6))
def rev7(x): return sum(((x >> i) & 1) << (6 - i) for i in range(7))
inits = {
    "0x40|rev6(i)": lambda i: 0x40 | rev6(i),
    "rev7(0x40|i)": lambda i: rev7(0x40 | i),
    "(i<<1)|1": lambda i: ((i << 1) | 1) & 0x7f,
    "(rev6(i)<<1)|1": lambda i: ((rev6(i) << 1) | 1) & 0x7f,
}
for name, fn in inits.items():
    ok = all(galois_stream(fn(i), 127) == [int(WHITE[(LE_IDX[i]+k) % 127]) for k in range(127)] for i in range(40))
    print(name, ok)
