import re, numpy as np
src = open('/root/reference/lib/packet_impl.cc').read()
def parse_array(name, src=src):
    m = re.search(name + r"\[\]\s*=\s*\{([^}]*)\}", src)
    return np.array([int(x) for x in re.findall(r"\d+", m.group(1))], dtype=np.int64)
WHITE = parse_array(r"WHITENING_DATA"); IDX = parse_array(r"classic_packet::INDICES")
LE_IDX = parse_array(r"le_packet::INDICES")
# The first 7 output bits are some linear map of init bits. Print window for each clk:
for clk in [0,1,2,3,4,32,63]:
    w = [int(WHITE[(IDX[clk]+k)%127]) for k in range(7)]
    print(f"clk={clk:2d} {clk:06b} window={w}")
