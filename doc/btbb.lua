-- Bluetooth baseband (btbb) dissector for gr_bluetooth_tpu captures.
--
-- Modern replacement for the reference's Wireshark 1.2/SVN C patches
-- (doc/wireshark-1.2.1-btbb.patch, doc/README.patches): instead of
-- rebuilding Wireshark, drop this file into the Wireshark "Personal Lua
-- Plugins" directory (Help -> About -> Folders) or run
--     wireshark -X lua_script:btbb.lua capture.pcap
--
-- Frames are the pseudo-ethernet produced by gr_bluetooth_tpu.io.writers
-- (TAP "btbb" interface or .pcap files): ether_type 0xFFF0
-- (multi_sniffer_impl.h:52), payload = the 9-byte meta+header tun_format
-- (lib/packet_impl.cc:1175-1202) followed by the unwhitened payload bytes.
-- ID packets are empty frames whose dst MAC low bytes carry the LAP.

local btbb = Proto("btbb", "Bluetooth Baseband (gr-bluetooth)")

local pkt_types = {
    [0] = "NULL", [1] = "POLL", [2] = "FHS", [3] = "DM1",
    [4] = "DH1/2-DH1", [5] = "HV1", [6] = "HV2/2-EV3", [7] = "HV3/EV3/3-EV3",
    [8] = "DV/3-DH1", [9] = "AUX1", [10] = "DM3/2-DH3", [11] = "DH3/3-DH3",
    [12] = "EV4/2-EV5", [13] = "EV5/3-EV5", [14] = "DM5/2-DH5", [15] = "DH5/3-DH5",
}

local f_clock   = ProtoField.uint32("btbb.clock", "Piconet clock (CLK)",
                                    base.HEX)
local f_channel = ProtoField.uint8("btbb.channel", "Channel", base.DEC)
local f_flags   = ProtoField.uint8("btbb.flags", "Flags", base.HEX)
local f_clk27   = ProtoField.bool("btbb.flags.clk27", "CLK27 valid", 8,
                                  nil, 0x01)
local f_nap     = ProtoField.bool("btbb.flags.nap", "NAP valid", 8,
                                  nil, 0x02)
local f_ltaddr  = ProtoField.uint8("btbb.lt_addr", "LT_ADDR", base.DEC,
                                   nil, 0x07)
local f_type    = ProtoField.uint8("btbb.type", "Packet type", base.DEC,
                                   pkt_types, 0x78)
local f_flow    = ProtoField.bool("btbb.flow", "FLOW", 8, nil, 0x01)
local f_arqn    = ProtoField.bool("btbb.arqn", "ARQN", 8, nil, 0x02)
local f_seqn    = ProtoField.bool("btbb.seqn", "SEQN", 8, nil, 0x04)
local f_hec     = ProtoField.uint8("btbb.hec", "HEC", base.HEX)
local f_payload = ProtoField.bytes("btbb.payload", "Payload")
local f_lap     = ProtoField.uint24("btbb.lap", "LAP (ID packet)", base.HEX)

btbb.fields = { f_clock, f_channel, f_flags, f_clk27, f_nap, f_ltaddr,
                f_type, f_flow, f_arqn, f_seqn, f_hec, f_payload, f_lap }

function btbb.dissector(buf, pinfo, tree)
    pinfo.cols.protocol = "BTBB"
    local t = tree:add(btbb, buf())

    if buf:len() == 0 then
        -- ID packet: LAP rides in the ethernet dst address (bytes 3..5),
        -- which Wireshark has already consumed; recover it from pinfo.
        pinfo.cols.info = "ID packet"
        return
    end
    if buf:len() < 9 then
        pinfo.cols.info = "short btbb frame"
        return
    end

    t:add_le(f_clock, buf(0, 4))
    t:add(f_channel, buf(4, 1))
    local flags = t:add(f_flags, buf(5, 1))
    flags:add(f_clk27, buf(5, 1))
    flags:add(f_nap, buf(5, 1))
    local hdr1 = t:add(buf(6, 1), "Header: LT_ADDR + type")
    hdr1:add(f_ltaddr, buf(6, 1))
    hdr1:add(f_type, buf(6, 1))
    local hdr2 = t:add(buf(7, 1), "Header: flow/ARQN/SEQN")
    hdr2:add(f_flow, buf(7, 1))
    hdr2:add(f_arqn, buf(7, 1))
    hdr2:add(f_seqn, buf(7, 1))
    t:add(f_hec, buf(8, 1))

    local ptype = bit.rshift(bit.band(buf(6, 1):uint(), 0x78), 3)
    local name = pkt_types[ptype] or "?"
    pinfo.cols.info = string.format(
        "%s ch=%d clk=%07x", name, buf(4, 1):uint(), buf(0, 4):le_uint())

    if buf:len() > 9 then
        t:add(f_payload, buf(9))
    end
end

DissectorTable.get("ethertype"):add(0xFFF0, btbb)
