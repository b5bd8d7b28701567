import re, numpy as np
src = open('/root/reference/lib/packet_impl.cc').read()
def parse_array(name, src=src):
    m = re.search(name + r"\[\]\s*=\s*\{([^}]*)\}", src)
    return np.array([int(x) for x in re.findall(r"\d+", m.group(1))], dtype=np.int64)
WHITE = parse_array(r"WHITENING_DATA"); IDX = parse_array(r"classic_packet::INDICES")
LE_IDX = parse_array(r"le_packet::INDICES")

def galois_stream(init, n):
    s = init; out = []
    for _ in range(n):
        o = (s >> 6) & 1
        s = ((s << 1) & 0x7f) ^ (0x11 if o else 0)
        out.append(o)
    return out

ok = all(galois_stream(0x40 | clk, 127) == [int(WHITE[(IDX[clk]+k) % 127]) for k in range(127)] for clk in range(64))
print("classic whitening: galois(0x40|clk) matches:", ok)
ok_le = all(galois_stream(0x40 | i, 127) == [int(WHITE[(LE_IDX[i]+k) % 127]) for k in range(127)] for i in range(40))
print("LE whitening: galois(0x40|index) matches:", ok_le)
