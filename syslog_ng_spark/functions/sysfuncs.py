"""System-lookup template functions: $(env), $(getent), $(dns-resolve-ip).

Reference: modules/basicfuncs/misc-funcs.c (tf_env), modules/getent
(tf_getent over passwd/group/services/protocols via getpwnam_r &co),
modules/basicfuncs/ip-funcs.c (tf_dns_resolve_ip via
resolve_sockaddr_to_hostname honoring the host-resolve options).

Spark-first design: every lookup table is loaded ONCE on the driver at
template-compile time and embedded as a literal `F.create_map`
expression. The map ships with the serialized plan to every executor —
no per-row syscalls, no UDF, no executor filesystem dependency, and the
same rows on a 1000-executor cluster as on the driver (an executor's
/etc/passwd may differ from the driver's; the reference resolves on the
one host it runs on, so driver-side load IS the parity behavior).

$(dns-resolve-ip) deliberately resolves from the hosts(5) file only —
the reference's `use-dns(persist_only)` + `dns-cache-hosts()` mode
(lib/host-resolve.c). Live per-row reverse DNS from executors would be
a scale hazard (unbounded blocking RPCs inside tasks) and is not
reproducible; persist-only is the deterministic subset.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F


def env_value(*names: str) -> Column:
    """$(env NAME...) — misc-funcs.c tf_env: driver-process environment
    values, space-separated, unset names skipped. Resolved at compile
    time (getenv is per-process static in the reference too)."""
    vals = [os.environ.get(n) for n in names]
    return F.lit(" ".join(v for v in vals if v is not None))


def _read_colon_file(path: str) -> list[list[str]]:
    rows = []
    try:
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rows.append(line.split(":"))
    except OSError:
        pass
    return rows


def _read_ws_file(path: str) -> list[list[str]]:
    rows = []
    try:
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                line = line.split("#", 1)[0].strip()
                if line:
                    rows.append(line.split())
    except OSError:
        pass
    return rows


_PASSWD_MEMBERS = ("name", "uid", "gid", "gecos", "dir", "shell")
_GROUP_MEMBERS = ("name", "gid")


def getent_table(database: str, etc_dir: str = "/etc") -> dict[tuple[str, str], str]:
    """(key, member) → value table for one getent database, loaded from
    the standard files the libc *_r lookups read (modules/getent).

    Key duality mirrors the reference: a numeric key looks up by
    uid/gid/port/number, a name key by name. Default member (when ''):
    passwd/group numeric→name, name→uid/gid (getent-passwd.c:65-71);
    services/protocols numeric→name, name→port/number (the only
    members those lookups format)."""
    out: dict[tuple[str, str], str] = {}
    if database == "passwd":
        for row in _read_colon_file(os.path.join(etc_dir, "passwd")):
            if len(row) < 7:
                continue
            name, _pw, uid, gid, gecos, home, shell = row[:7]
            vals = dict(zip(_PASSWD_MEMBERS, (name, uid, gid, gecos, home, shell)))
            for key, default in ((uid, "name"), (name, "uid")):
                for m, v in vals.items():
                    out[(key, m)] = v
                out[(key, "")] = vals[default]
    elif database == "group":
        for row in _read_colon_file(os.path.join(etc_dir, "group")):
            if len(row) < 3:
                continue
            name, _pw, gid = row[:3]
            vals = dict(zip(_GROUP_MEMBERS, (name, gid)))
            for key, default in ((gid, "name"), (name, "gid")):
                for m, v in vals.items():
                    out[(key, m)] = v
                out[(key, "")] = vals[default]
    elif database == "services":
        for row in _read_ws_file(os.path.join(etc_dir, "services")):
            if len(row) < 2 or "/" not in row[1]:
                continue
            name = row[0]
            port = row[1].split("/", 1)[0]
            # numeric key → name, name key (incl. aliases) → port
            # (getent-services.c: is_num picks the output)
            out.setdefault((port, ""), name)
            for alias in [name] + row[2:]:
                out.setdefault((alias, ""), port)
    elif database == "protocols":
        for row in _read_ws_file(os.path.join(etc_dir, "protocols")):
            if len(row) < 2:
                continue
            name, number = row[0], row[1]
            out.setdefault((number, ""), name)
            for alias in [name] + row[2:]:
                out.setdefault((alias, ""), number)
    else:
        raise ValueError(
            f"$(getent): unsupported database {database!r} "
            "(passwd, group, services, protocols — modules/getent)"
        )
    return out


def getent_lookup(
    database: str, key: Column, member: str = "", etc_dir: str = "/etc"
) -> Column:
    """$(getent database key [member]) as a literal-map lookup; unknown
    key renders unset ('' downstream), like the reference's silent
    FALSE return."""
    table = getent_table(database, etc_dir)
    if member not in ("", *(_PASSWD_MEMBERS if database == "passwd" else _GROUP_MEMBERS)) and database in (
        "passwd",
        "group",
    ):
        raise ValueError(f"$(getent {database}): unknown member {member!r}")
    pairs: list[Column] = []
    for (k, m), v in table.items():
        if m == member:
            pairs.append(F.lit(k))
            pairs.append(F.lit(v))
    if not pairs:
        return F.lit(None).cast("string")
    return F.element_at(F.create_map(*pairs), key.cast("string"))


def hosts_table(hosts_path: str = "/etc/hosts") -> dict[str, str]:
    """ip → first hostname from a hosts(5) file (the reference's
    dns-cache-hosts persist-only source, lib/dnscache.c)."""
    out: dict[str, str] = {}
    for row in _read_ws_file(hosts_path):
        if len(row) >= 2:
            out.setdefault(row[0], row[1])
    return out


def dns_resolve_ip(ip: Column, hosts_path: str = "/etc/hosts") -> Column:
    """$(dns-resolve-ip IP) in persist-only mode: hosts-file map lookup,
    falling back to the IP itself when unknown (host-resolve.c returns
    the address string when resolution is off/fails)."""
    table = hosts_table(hosts_path)
    ip_s = ip.cast("string")
    if not table:
        return ip_s
    pairs: list[Column] = []
    for k, v in table.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.coalesce(F.element_at(F.create_map(*pairs), ip_s), ip_s)
