"""Interface enrichment builder: SNMP walk -> per-interface enrichment.

Spark twin of the reference's interface enrichment plugin family
(``yahoo_panoptes/plugins/enrichment/interface/plugin_enrichment_interface.py``
and its arista/cisco/juniper subclasses). Input is the long varbind frame
of the seven walked MIB columns; output is one enrichment row per
(device, interface) with the exact reference field semantics:

- ``interface_name`` / ``description``: walked value or ``'<not set>'``
- ``media_type``: IANA ifType registry decode (``getIfTypeDesc``,
  ``mibs/ifTable.py``) — broadcast dim join
- ``alias``: non-empty walked value or ``'<not set>'``
- ``configured_speed``: ifHighSpeed×1e6 (Mbps→bps) unless high-speed is
  0/1/absent, then ifSpeed, falling through 0/absent exactly like
  ``get_configured_speed`` (:133-139 — note a *missing* ifSpeed returns
  the -1 sentinel even on the high-speed-absent path)
- ``port_speed``: vendor override by interface-name prefix (cisco
  Gi/Te, juniper ge/xe/xle/et/fte with the QFX5200/QFX10000 'et'
  model exception), else ``configured_speed``
- ``physical_address``: hex octets -> uppercase ':'-MAC
  (``transform_octet_to_mac``, ``helpers.py:418-434``) or ``'<not set>'``
- ``parent_interface_*``: vendor parent-name grammar (arista '/',
  cisco '.', juniper ':'/'.') + the base class's name->index lookup for
  media/speeds (cisco/base), or arista's self-referential values
  (:plugin_enrichment_interface_arista.py — parent media = OWN media
  even when parentless; parent speeds = 4x own configured speed)

Scale shape: one groupBy pivot of the walk (keyed by device+index), one
broadcast ifType dim join, one broadcast parent-name self-join within
device — the walk stream shuffles once.

Replayed against the reference's own vendor golden fixtures in
``tests/test_golden_interface.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MISSING_VALUE_STRING = "<not set>"
MISSING_METRIC_VALUE = -1

# IANA ifType registry names, position = code - 1 (public registry data;
# mirrors the reference's frozen copy in mibs/ifTable.py:ifTypeEnum)
_IFTYPE_NAMES = (
    "other regular1822 hdh1822 ddnX25 rfc877x25 ethernetCsmacd "
    "iso88023Csmacd iso88024TokenBus iso88025TokenRing iso88026Man starLan "
    "proteon10Mbit proteon80Mbit hyperchannel fddi lapb sdlc ds1 e1 "
    "basicISDN primaryISDN propPointToPointSerial ppp softwareLoopback eon "
    "ethernet3Mbit nsip slip ultra ds3 sip frameRelay rs232 para arcnet "
    "arcnetPlus atm miox25 sonet x25ple iso88022llc localTalk smdsDxi "
    "frameRelayService v35 hssi hippi modem aal5 sonetPath sonetVT "
    "smdsIcip propVirtual propMultiplexor ieee80212 fibreChannel "
    "hippiInterface frameRelayInterconnect aflane8023 aflane8025 cctEmul "
    "fastEther isdn v11 v36 g703at64k g703at2mb qllc fastEtherFX channel "
    "ieee80211 ibm370parChan escon dlsw isdns isdnu lapd ipSwitch rsrb "
    "atmLogical ds0 ds0Bundle bsc async cnr iso88025Dtr eplrs arap "
    "propCnls hostPad termPad frameRelayMPI x213 adsl radsl sdsl vdsl "
    "iso88025CRFPInt myrinet voiceEM voiceFXO voiceFXS voiceEncap "
    "voiceOverIp atmDxi atmFuni atmIma pppMultilinkBundle ipOverCdlc "
    "ipOverClaw stackToStack virtualIpAddress mpc ipOverAtm iso88025Fiber "
    "tdlc gigabitEthernet hdlc lapf v37 x25mlp x25huntGroup transpHdlc "
    "interleave fast ip docsCableMaclayer docsCableDownstream "
    "docsCableUpstream a12MppSwitch tunnel coffee ces atmSubInterface "
    "l2vlan l3ipvlan l3ipxvlan digitalPowerline mediaMailOverIp dtm dcn "
    "ipForward msdsl ieee1394 if-gsn dvbRccMacLayer dvbRccDownstream "
    "dvbRccUpstream atmVirtual mplsTunnel srp voiceOverAtm "
    "voiceOverFrameRelay idsl compositeLink ss7SigLink propWirelessP2P "
    "frForward rfc1483 usb ieee8023adLag bgppolicyaccounting "
    "frf16MfrBundle h323Gatekeeper h323Proxy mpls mfSigLink hdsl2 shdsl "
    "ds1FDL pos dvbAsiIn dvbAsiOut plc nfas tr008 gr303RDT gr303IDT isup "
    "propDocsWirelessMaclayer propDocsWirelessDownstream "
    "propDocsWirelessUpstream hiperlan2 propBWAp2Mp sonetOverheadChannel "
    "digitalWrapperOverheadChannel aal2 radioMAC atmRadio imt mvl "
    "reachDSL frDlciEndPt atmVciEndPt opticalChannel opticalTransport "
    "propAtm voiceOverCable infiniband teLink q2931 virtualTg sipTg "
    "sipSig docsCableUpstreamChannel econet pon155 pon622 bridge "
    "linegroup voiceEMFGD voiceFGDEANA voiceDID mpegTransport sixToFour "
    "gtp pdnEtherLoop1 pdnEtherLoop2 opticalChannelGroup homepna gfp "
    "ciscoISLvlan actelisMetaLOOP fcipLink rpr qam lmp cblVectaStar "
    "docsCableMCmtsDownstream adsl2 macSecControlledIF macSecUncontrolledIF "
    "aviciOpticalEther atmbond voiceFGDOS mocaVersion1 ieee80216WMAN "
    "adsl2plus dvbRcsMacLayer dvbTdm dvbRcsTdma x86Laps wwanPP wwanPP2 "
    "voiceEBS ifPwType ilan pip aluELP gpon vdsl2"
).split()

# vendor port-speed prefix tables (cisco/juniper subclasses)
_PORT_SPEED_PREFIXES = {
    "cisco": [("Gi", 10**9), ("Te", 10**10)],
    "juniper": [
        ("ge", 10**9),
        ("xe", 10**10),
        ("xle", 4 * 10**10),
        ("et", 4 * 10**10),
        ("fte", 4 * 10**10),
    ],
}

WALK_COLUMNS = [
    "if_type",
    "if_descr",
    "if_name",
    "if_alias",
    "if_high_speed",
    "if_speed",
    "if_phys_hex",
]


def _not_set(c: F.Column) -> F.Column:
    return F.when(
        c.isNotNull() & (c != ""), c
    ).otherwise(F.lit(MISSING_VALUE_STRING))


def _media_type(spark, wide: DataFrame) -> DataFrame:
    enum = spark.createDataFrame(
        [(i + 1, n) for i, n in enumerate(_IFTYPE_NAMES)],
        "__type_code int, media_type string",
    )
    out = wide.join(
        F.broadcast(enum),
        wide["if_type"].cast("int") == enum["__type_code"],
        "left",
    ).drop("__type_code")
    return out.withColumn(
        "media_type",
        F.coalesce("media_type", F.lit(MISSING_VALUE_STRING)),
    )


def _configured_speed() -> F.Column:
    """get_configured_speed (:133-139): high-speed path vs if-speed
    fallthrough, sentinel-faithful."""
    high = F.col("if_high_speed")
    speed = F.coalesce(
        F.col("if_speed").cast("long"), F.lit(MISSING_METRIC_VALUE)
    )
    return F.when(
        high.isNotNull() & ~high.isin("0", "1"),
        high.cast("long") * 1000000,
    ).otherwise(
        F.when(speed != 0, speed).otherwise(
            F.when(high.isNotNull(), high.cast("long") * 1000000).otherwise(
                F.lit(MISSING_METRIC_VALUE)
            )
        )
    )


def interface_enrichment(
    spark,
    walk: DataFrame,
    vendor: str | None = None,
    device_model: str | None = None,
) -> DataFrame:
    """Long walk frame -> per-interface enrichment rows.

    ``walk`` schema: (device_id string, column string, index string,
    value string) where ``column`` is one of :data:`WALK_COLUMNS`
    (``if_phys_hex`` carries the hex-encoded octets, i.e. the snmprec
    ``4x`` payload). ``vendor``: None | 'arista' | 'cisco' | 'juniper'.
    ``device_model`` feeds juniper's QFX 'et' = 100 Gbps exception.
    """
    wide = (
        walk.groupBy("device_id", "index")
        .pivot("column", WALK_COLUMNS)
        .agg(F.max("value"))
    )
    wide = _media_type(spark, wide)
    name = F.coalesce(
        F.col("if_name"), F.lit(MISSING_VALUE_STRING)
    )
    wide = (
        wide.withColumn("interface_name", name)
        .withColumn(
            "description",
            F.coalesce(F.col("if_descr"), F.lit(MISSING_VALUE_STRING)),
        )
        .withColumn("alias", _not_set(F.col("if_alias")))
        .withColumn("configured_speed", _configured_speed())
        .withColumn(
            "physical_address",
            F.when(
                F.col("if_phys_hex").isNotNull()
                & (F.col("if_phys_hex") != ""),
                F.upper(
                    F.array_join(
                        F.expr("regexp_extract_all(if_phys_hex, '..', 0)"),
                        ":",
                    )
                ),
            ).otherwise(F.lit(MISSING_VALUE_STRING)),
        )
    )

    # vendor port speed by interface-name prefix; the reference iterates
    # its table in order and returns on FIRST match, so fold the CASE
    # chain in reverse to preserve that priority
    prefixes = _PORT_SPEED_PREFIXES.get(vendor or "", [])
    port = F.col("configured_speed")
    for prefix, bps in reversed(prefixes):
        if vendor == "juniper" and prefix == "et":
            bps_val = 10**11 if device_model in ("QFX5200", "QFX10000") else bps
        else:
            bps_val = bps
        port = F.when(
            F.col("interface_name").startswith(prefix), F.lit(bps_val)
        ).otherwise(port)
    wide = wide.withColumn("port_speed", port)

    # vendor parent-name grammar
    n = F.col("interface_name")
    if vendor == "arista":
        parent_name = F.when(
            n.contains("/"), F.split(n, "/").getItem(0)
        ).otherwise(F.lit(MISSING_VALUE_STRING))
    elif vendor == "cisco":
        parent_name = F.when(
            n.contains("."), F.split(n, r"\.").getItem(0)
        ).otherwise(F.lit(MISSING_VALUE_STRING))
    elif vendor == "juniper":
        parent_name = F.when(
            n.contains(".") , F.split(n, r"\.").getItem(0)
        ).otherwise(
            F.when(n.contains(":"), F.split(n, ":").getItem(0)).otherwise(
                F.lit(MISSING_VALUE_STRING)
            )
        )
    else:
        parent_name = F.lit(MISSING_VALUE_STRING)
    wide = wide.withColumn("parent_interface_name", parent_name)

    if vendor == "arista":
        # arista: parent media = OWN media even when parentless; parent
        # speeds = 4x own configured speed when a parent exists
        has_parent = F.col("parent_interface_name") != MISSING_VALUE_STRING
        out = (
            wide.withColumn(
                "parent_interface_media_type", F.col("media_type")
            )
            .withColumn(
                "parent_interface_configured_speed",
                F.when(
                    has_parent, F.col("configured_speed") * 4
                ).otherwise(F.lit(MISSING_METRIC_VALUE)),
            )
            .withColumn(
                "parent_interface_port_speed",
                F.when(
                    has_parent, F.col("configured_speed") * 4
                ).otherwise(F.lit(MISSING_METRIC_VALUE)),
            )
        )
    else:
        # base/cisco/juniper: look the parent up by interface name
        # (reference _get_index_from_interface_name — first match; we
        # take the lowest index for a deterministic tie-break)
        parents = wide.select(
            "device_id",
            F.col("interface_name").alias("parent_interface_name"),
            F.col("index").alias("__pidx"),
            F.col("media_type").alias("__p_media"),
            F.col("configured_speed").alias("__p_conf"),
            F.col("port_speed").alias("__p_port"),
        ).withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(
                    "device_id", "parent_interface_name"
                ).orderBy(F.col("__pidx").cast("long").asc_nulls_last())
            ),
        ).where(F.col("__rk") == 1).drop("__rk", "__pidx")
        joined = wide.join(
            F.broadcast(parents), ["device_id", "parent_interface_name"], "left"
        )
        out = (
            joined.withColumn(
                "parent_interface_media_type",
                F.when(
                    F.col("parent_interface_name") != MISSING_VALUE_STRING,
                    F.coalesce("__p_media", F.lit(MISSING_VALUE_STRING)),
                ).otherwise(F.lit(MISSING_VALUE_STRING)),
            )
            .withColumn(
                "parent_interface_configured_speed",
                F.when(
                    (F.col("parent_interface_name") != MISSING_VALUE_STRING)
                    & F.col("__p_conf").isNotNull(),
                    F.col("__p_conf"),
                ).otherwise(F.lit(MISSING_METRIC_VALUE)),
            )
            .withColumn(
                "parent_interface_port_speed",
                F.when(
                    (F.col("parent_interface_name") != MISSING_VALUE_STRING)
                    & F.col("__p_port").isNotNull(),
                    F.col("__p_port"),
                ).otherwise(F.lit(MISSING_METRIC_VALUE)),
            )
            .drop("__p_media", "__p_conf", "__p_port")
        )

    return out.select(
        "device_id",
        F.col("index").alias("interface_index"),
        "interface_name",
        "description",
        "media_type",
        "alias",
        F.col("configured_speed").cast("long").alias("configured_speed"),
        F.col("port_speed").cast("long").alias("port_speed"),
        "physical_address",
        "parent_interface_name",
        "parent_interface_media_type",
        F.col("parent_interface_configured_speed")
        .cast("long")
        .alias("parent_interface_configured_speed"),
        F.col("parent_interface_port_speed")
        .cast("long")
        .alias("parent_interface_port_speed"),
    )
