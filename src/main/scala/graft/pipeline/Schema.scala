package graft.pipeline

/** Input-table row per the north rule's input_hint:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Kernel output row. The DOM tree itself never leaves the partition — only
  * this columnar projection does (Tungsten-encoded after SerializeFromObject).
  */
final case class ParsedDoc(
    doc_id: Long,
    url: String,
    warc_ts: java.sql.Timestamp,
    lang: String,
    parse_ok: Boolean,
    text_out: String,
    n_nodes: Int,
    n_elements: Int,
    n_links: Int,
    n_bytes: Int)
