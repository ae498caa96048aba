"""Built-in parser pack: the reference's stock parser definitions,
loadable by name with no external file.

Source of each definition (regexes and time formats are verbatim
configuration data; structure re-expressed as Python):
- /root/reference/conf/parsers.conf (apache, apache2, apache_error,
  nginx, k8s-nginx-ingress, json, logfmt, docker, docker-daemon,
  syslog-rfc5424, syslog-rfc3164-local, syslog-rfc3164, mongodb,
  envoy, istio-envoy-proxy, cri, kube-custom, kmsg-netfilter-log)
- /root/reference/conf/parsers_extra.conf (crowbar, chefclient,
  mysql_error, mysql_slow, pacemaker, rabbitmq, http_statement,
  universal, uuid, iptables)

``builtin_parsers()`` renders these through parse_parsers_conf so the
semantics (grok/regex compilation, time handling, decoders, types)
stay single-sourced with the [PARSER] config reader; use
``merge_builtin_parsers`` to make ``[FILTER] Name parser`` /
``[INPUT] Parser`` resolve stock names without a Parsers_File.
"""

from __future__ import annotations

from functools import lru_cache

from fluent_bit_spark.parsers.config import ParserSpec, parse_parsers_conf

# name -> ordered [PARSER] properties (key, value)
BUILTIN: dict[str, list[tuple[str, str]]] = {
    'apache': [
        ('format', 'regex'),
        ('regex', '^(?<host>[^ ]*) [^ ]* (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] "(?<method>\\S+)(?: +(?<path>[^\\"]*?)(?: +\\S*)?)?" (?<code>[^ ]*) (?<size>[^ ]*)(?: "(?<referer>[^\\"]*)" "(?<agent>[^\\"]*)")?$'),
        ('time_key', 'time'),
        ('time_format', '%d/%b/%Y:%H:%M:%S %z'),
    ],
    'apache2': [
        ('format', 'regex'),
        ('regex', '^(?<host>[^ ]*) [^ ]* (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] "(?<method>\\S+)(?: +(?<path>[^ ]*) +\\S*)?" (?<code>[^ ]*) (?<size>[^ ]*)(?: "(?<referer>[^\\"]*)" "(?<agent>.*)")?$'),
        ('time_key', 'time'),
        ('time_format', '%d/%b/%Y:%H:%M:%S %z'),
    ],
    'apache_error': [
        ('format', 'regex'),
        ('regex', '^\\[[^ ]* (?<time>[^\\]]*)\\] \\[(?<level>[^\\]]*)\\](?: \\[pid (?<pid>[^\\]]*)\\])?( \\[client (?<client>[^\\]]*)\\])? (?<message>.*)$'),
    ],
    'nginx': [
        ('format', 'regex'),
        ('regex', '^(?<remote>[^ ]*) (?<host>[^ ]*) (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] "(?<method>\\S+)(?: +(?<path>[^\\"]*?)(?: +\\S*)?)?" (?<code>[^ ]*) (?<size>[^ ]*)(?: "(?<referer>[^\\"]*)" "(?<agent>[^\\"]*)")'),
        ('time_key', 'time'),
        ('time_format', '%d/%b/%Y:%H:%M:%S %z'),
    ],
    'k8s-nginx-ingress': [
        ('format', 'regex'),
        ('regex', '^(?<host>[^ ]*) - (?<user>[^ ]*) \\[(?<time>[^\\]]*)\\] "(?<method>\\S+)(?: +(?<path>[^\\"]*?)(?: +\\S*)?)?" (?<code>[^ ]*) (?<size>[^ ]*) "(?<referer>[^\\"]*)" "(?<agent>[^\\"]*)" (?<request_length>[^ ]*) (?<request_time>[^ ]*) \\[(?<proxy_upstream_name>[^ ]*)\\] (\\[(?<proxy_alternative_upstream_name>[^ ]*)\\] )?(?<upstream_addr>[^ ]*) (?<upstream_response_length>[^ ]*) (?<upstream_response_time>[^ ]*) (?<upstream_status>[^ ]*) (?<reg_id>[^ ]*).*$'),
        ('time_key', 'time'),
        ('time_format', '%d/%b/%Y:%H:%M:%S %z'),
    ],
    'json': [
        ('format', 'json'),
        ('time_key', 'time'),
        ('time_format', '%d/%b/%Y:%H:%M:%S %z'),
    ],
    'logfmt': [
        ('format', 'logfmt'),
    ],
    'docker': [
        ('format', 'json'),
        ('time_key', 'time'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L'),
        ('time_keep', 'On'),
    ],
    'docker-daemon': [
        ('format', 'regex'),
        ('regex', 'time="(?<time>[^ ]*)" level=(?<level>[^ ]*) msg="(?<msg>[^ ].*)"'),
        ('time_key', 'time'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L'),
        ('time_keep', 'On'),
    ],
    'syslog-rfc5424': [
        ('format', 'regex'),
        ('regex', '^\\<(?<pri>[0-9]{1,5})\\>1 (?<time>[^ ]+) (?<host>[^ ]+) (?<ident>[^ ]+) (?<pid>[-0-9]+) (?<msgid>[^ ]+) (?<extradata>(\\[(.*?)\\]|-)) (?<message>.+)$'),
        ('time_key', 'time'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L%z'),
        ('time_keep', 'On'),
    ],
    'syslog-rfc3164-local': [
        ('format', 'regex'),
        ('regex', '^\\<(?<pri>[0-9]+)\\>(?<time>[^ ]* {1,2}[^ ]* [^ ]*) (?<ident>[a-zA-Z0-9_\\/\\.\\-]*)(?:\\[(?<pid>[0-9]+)\\])?(?:[^\\:]*\\:)? *(?<message>.*)$'),
        ('time_key', 'time'),
        ('time_format', '%b %d %H:%M:%S'),
        ('time_keep', 'On'),
    ],
    'syslog-rfc3164': [
        ('format', 'regex'),
        ('regex', '/^\\<(?<pri>[0-9]+)\\>(?<time>[^ ]* {1,2}[^ ]* [^ ]*) (?<host>[^ ]*) (?<ident>[a-zA-Z0-9_\\/\\.\\-]*)(?:\\[(?<pid>[0-9]+)\\])?(?:[^\\:]*\\:)? *(?<message>.*)$/'),
        ('time_key', 'time'),
        ('time_format', '%b %d %H:%M:%S'),
        ('time_keep', 'On'),
    ],
    'mongodb': [
        ('format', 'regex'),
        ('regex', '^(?<time>[^ ]*)\\s+(?<severity>\\w)\\s+(?<component>[^ ]+)\\s+\\[(?<context>[^\\]]+)]\\s+(?<message>.*?) *(?<ms>(\\d+))?(:?ms)?$'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L'),
        ('time_keep', 'On'),
        ('time_key', 'time'),
    ],
    'envoy': [
        ('format', 'regex'),
        ('regex', '^\\[(?<start_time>[^\\]]*)\\] "(?<method>\\S+)(?: +(?<path>[^\\"]*?)(?: +\\S*)?)? (?<protocol>\\S+)" (?<code>[^ ]*) (?<response_flags>[^ ]*) (?<bytes_received>[^ ]*) (?<bytes_sent>[^ ]*) (?<duration>[^ ]*) (?<x_envoy_upstream_service_time>[^ ]*) "(?<x_forwarded_for>[^ ]*)" "(?<user_agent>[^\\"]*)" "(?<request_id>[^\\"]*)" "(?<authority>[^ ]*)" "(?<upstream_host>[^ ]*)"'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L%z'),
        ('time_keep', 'On'),
        ('time_key', 'start_time'),
    ],
    'istio-envoy-proxy': [
        ('format', 'regex'),
        ('regex', '^\\[(?<start_time>[^\\]]*)\\] "(?<method>\\S+)(?: +(?<path>[^\\"]*?)(?: +\\S*)?)? (?<protocol>\\S+)" (?<response_code>[^ ]*) (?<response_flags>[^ ]*) (?<response_code_details>[^ ]*) (?<connection_termination_details>[^ ]*) "(?<upstream_transport_failure_reason>[^ ]*)" (?<bytes_received>[^ ]*) (?<bytes_sent>[^ ]*) (?<duration>[^ ]*) (?<x_envoy_upstream_service_time>[^ ]*) "(?<x_forwarded_for>[^ ]*)" "(?<user_agent>[^\\"]*)" "(?<x_request_id>[^\\"]*)" "(?<authority>[^ ]*)" "(?<upstream_host>[^ ]*)" (?<upstream_cluster>[^ ]*) (?<upstream_local_address>[^ ]*) (?<downstream_local_address>[^ ]*) (?<downstream_remote_address>[^ ]*) (?<requested_server_name>[^ ]*) (?<route_name>[^  ]*)$'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L%z'),
        ('time_keep', 'On'),
        ('time_key', 'start_time'),
    ],
    'cri': [
        ('format', 'regex'),
        ('regex', '^(?<time>[^ ]+) (?<stream>stdout|stderr) (?<logtag>[^ ]*) (?<message>.*)$'),
        ('time_key', 'time'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L%z'),
        ('time_keep', 'On'),
    ],
    'kube-custom': [
        ('format', 'regex'),
        ('regex', '(?<tag>[^.]+)?\\.?(?<pod_name>[a-z0-9](?:[-a-z0-9]*[a-z0-9])?(?:\\.[a-z0-9]([-a-z0-9]*[a-z0-9])?)*)_(?<namespace_name>[^_]+)_(?<container_name>.+)-(?<docker_id>[a-z0-9]{64})\\.log$'),
    ],
    'kmsg-netfilter-log': [
        ('format', 'regex'),
        ('regex', '^\\<(?<pri>[0-9]{1,5})\\>1 (?<time>[^ ]+) (?<host>[^ ]+) kernel - - - \\[[0-9\\.]*\\] (?<logprefix>[^ ]*)\\s?IN=(?<in>[^ ]*) OUT=(?<out>[^ ]*) MAC=(?<macsrc>[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}):(?<macdst>[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}):(?<ethtype>[0-9a-f]{2}:[0-9a-f]{2}) SRC=(?<saddr>[^ ]*) DST=(?<daddr>[^ ]*) LEN=(?<len>[^ ]*) TOS=(?<tos>[^ ]*) PREC=(?<prec>[^ ]*) TTL=(?<ttl>[^ ]*) ID=(?<id>[^ ]*) (D*F*)\\s*PROTO=(?<proto>[^ ]*)\\s?((SPT=)?(?<sport>[0-9]*))\\s?((DPT=)?(?<dport>[0-9]*))\\s?((LEN=)?(?<protolen>[0-9]*))\\s?((WINDOW=)?(?<window>[0-9]*))\\s?((RES=)?(?<res>0?x?[0-9]*))\\s?(?<flag>[^ ]*)\\s?((URGP=)?(?<urgp>[0-9]*))'),
        ('time_key', 'time'),
        ('time_format', '%Y-%m-%dT%H:%M:%S.%L%z'),
    ],
    'crowbar': [
        ('format', 'regex'),
        ('regex', '^.*\\[(?<log_time>[^ ][-.\\d\\+:]+T[:\\d]*)([^\\]])*?\\]\\s+?(?<severity>[^ ]\\w+)([\\s-]*):?\\s+(?<message>.*)'),
        ('time_format', '%Y-%m-%dT%H:%M:%S'),
        ('time_keep', 'Off'),
        ('time_key', 'log_time'),
    ],
    'chefclient': [
        ('format', 'regex'),
        ('regex', '^\\[(?<log_time>[^ ][-.\\d\\+:]+T[:\\d]*)([^\\]])*?\\]\\s+(?<severity>[^ ]\\w+):\\s+(?<message>.*)$'),
        ('time_format', '%Y-%m-%dT%H:%M:%S'),
        ('time_keep', 'Off'),
        ('time_key', 'log_time'),
    ],
    'mysql_error': [
        ('format', 'regex'),
        ('regex', '^(?<log_time>[^ +][-\\d]+[\\ T]*[:\\dZ]+)\\s*(?<myid>[^ ]\\d+)\\s+\\[(?<severity>[^ ]\\w+)\\](\\s+(?<subsystem>[^ ]\\w+):){0,1}\\s+(?<message>.*)$'),
        ('time_format', '%Y-%m-%d %H:%M:%S'),
        ('time_keep', 'Off'),
        ('time_key', 'log_time'),
    ],
    'mysql_slow': [
        ('format', 'regex'),
        ('regex', '^# User\\@Host:\\s+(?<user>[^\\@][\\w\\[\\]]+)[@\\s]+(?<dbhost>[^ ][-.\\w]+)\\s+(\\[(?<dbhost_address>[.\\d]+)\\]){0,1}\\s+(?<message>.*)$'),
    ],
    'pacemaker': [
        ('format', 'regex'),
        ('regex', '^\\s*(?<log_time>[^ ]* {1,2}[^ ]* [^ ]*) \\[(?<pid>\\d+)\\] (?<node>[\\-\\w]*)\\s*(?<component>\\w*):\\s+(?<severity>\\w+):\\s+(?<message>.*)$'),
        ('time_format', '%b %d %H:%M:%S'),
        ('time_keep', 'Off'),
        ('time_key', 'log_time'),
    ],
    'rabbitmq': [
        ('format', 'regex'),
        ('regex', '^=(?<severity>[^ ]\\w+)\\s+REPORT[=\\s]*(?<log_time>[^ =][-:.\\d\\w]+)[\\s=]+(?<message>.*)$'),
        ('time_format', '%d-%b-%Y::%H:%M:%S'),
        ('time_keep', 'Off'),
        ('time_key', 'log_time'),
    ],
    'http_statement': [
        ('format', 'regex'),
        ('regex', '^.*((?<req_method>GET|POST|PUT|DELETE|CONNECT|OPTIONS|HEAD[^ ]\\w+)\\s*(?<req_path>[^ ][-._?=%&\\/[:alnum:]]*)\\s*(?<req_protocol>[^ ][.\\/\\dHTFSP]+){0,1})([\'"\\s]*){0,1}((\\s*status:\\s*(?<req_status>[^ ]\\d+)){0,1}(\\s*len:\\ (?<req_len>[^ ]\\d+)){0,1}(\\s*time:\\s*(?<req_log_time>[^ ][.\\d]+)){0,1}(\\s*microversion:\\s*(?<req_mver>[^ ][.\\d]+)){0,1}){0,1}$'),
    ],
    'universal': [
        ('format', 'regex'),
        ('regex', '^(?<message>.*)$'),
    ],
    'uuid': [
        ('format', 'regex'),
        ('regex', '(?<uuid>[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[1-5][0-9a-fA-F]{3}-[89abAB][0-9a-fA-F]{3}-[0-9a-fA-F]{12})'),
    ],
    'iptables': [
        ('format', 'regex'),
        ('regex', '\\[(?<rule_chain>\\w*)-(?<rule_name>\\w*)-(?<accept_or_drop>\\w*)\\]IN=(?<in_interface>[\\w.]+)? OUT=(?<out_interface>[\\w.]+)? MAC=(?<mac_address>[\\w:]+)? SRC=(?<source>(?:[0-9]{1,3}\\.){3}[0-9]{1,3}) DST=(?<dest>(?:[0-9]{1,3}\\.){3}[0-9]{1,3}) LEN=(?<pkt_len>\\d+) TOS=(?<pkt_tos>[\\w\\d]+) PREC=(?<pkt_prec>[\\w\\d]+) TTL=(?<pkt_ttl>\\d+) ID=(?<pkt_id>\\d+)\\s?(?<pkg_frg>[A-Z\\s].?)\\s?PROTO=(?<protocol>[\\w\\d]+) (SPT=(?<source_port>.*) DPT=(?<dest_port>.*) (LEN=(?<proto_pkt_len>\\w+)?)?(WINDOW=(?<proto_window_size>\\d+) RES=(?<pkt_res>\\w+)? (?<pkt_type>\\w+)\\s((?<pkt_flag>\\w+)?)\\s?URGP=(?<pkg_urgency>\\d))? )?(TYPE=(?<pkt_icmp_type>\\d+) CODE=(?<pkt_icmp_code>\\d+) ID=(?<pkt_icmp_id>\\d+) SEQ=(?<pkt_icmp_seq>\\d+) )?$'),
        ('types', 'source_port:integer,dest_port:integer,pkt_ttl:integer,pkt_tos:integer,pkt_len:integer'),
    ],
}


@lru_cache(maxsize=1)
def builtin_parsers() -> dict[str, ParserSpec]:
    """All built-in parsers as compiled ParserSpecs (cached)."""
    chunks = []
    for name, props in BUILTIN.items():
        chunks.append("[PARSER]")
        chunks.append(f"    name {name}")
        chunks.extend(f"    {k} {v}" for k, v in props)
    return parse_parsers_conf("\n".join(chunks))


def merge_builtin_parsers(
    specs: dict[str, ParserSpec],
) -> dict[str, ParserSpec]:
    """Config-defined parsers win over same-named built-ins
    (flb_parser_conf_file loads user files after the defaults)."""
    merged = dict(builtin_parsers())
    merged.update(specs)
    return merged
