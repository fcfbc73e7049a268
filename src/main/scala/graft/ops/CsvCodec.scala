package graft.ops

/** RFC 4180 CSV — the tabular dump shape text corpora arrive in, and the
  * format a naive line-splitter corrupts: quoted fields legally contain
  * COMMAS, NEWLINES and doubled-quote escapes, so "split on \n, then on
  * ," silently shears records. This codec is the strict state-machine
  * walk: writer quotes exactly the fields that need it; reader handles
  * embedded separators/breaks/escapes and fails LOUDLY on the malformed
  * shapes readers usually guess through — a bare `"` inside an unquoted
  * field, a closing quote followed by anything but a separator, an
  * unterminated quote at EOF, or RAGGED rows (field count differing from
  * the header's). */
object CsvCodec {

  /** One record, fields quoted iff they contain comma/quote/CR/LF. */
  def writeRow(fields: Seq[String]): String =
    fields.map { f =>
      if (f.exists(c => c == ',' || c == '"' || c == '\r' || c == '\n'))
        "\"" + f.replace("\"", "\"\"") + "\""
      else f
    }.mkString(",")

  /** A whole file: CRLF-joined records with a trailing CRLF. */
  def write(rows: Seq[Seq[String]]): String =
    rows.map(writeRow).map(_ + "\r\n").mkString

  /** Parse a whole file. Rows must be uniform width (ragged throws). */
  def parse(csv: String): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    var row = Seq.newBuilder[String]
    val field = new StringBuilder
    var i = 0
    var inQuotes = false
    var fieldStarted = false
    var fieldWasQuoted = false
    var nFields = 0
    var width = -1
    def endField(): Unit = {
      row += field.toString
      field.clear()
      nFields += 1
      fieldStarted = false
      fieldWasQuoted = false
    }
    def endRow(): Unit = {
      endField()
      require(width == -1 || nFields == width,
        s"csv: ragged row ($nFields fields, expected $width)")
      width = nFields
      nFields = 0
      rows += row.result()
      row = Seq.newBuilder[String]
    }
    while (i < csv.length) {
      val c = csv.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < csv.length && csv.charAt(i + 1) == '"') {
            field.append('"'); i += 1 // doubled-quote escape
          } else inQuotes = false
        } else field.append(c)
      } else if (c == '"') {
        require(!fieldStarted,
          if (fieldWasQuoted) s"csv: quote after closing quote at $i"
          else s"csv: bare quote inside unquoted field at $i")
        inQuotes = true
        fieldStarted = true
        fieldWasQuoted = true
      } else if (c == ',') endField()
      else if (c == '\r') {
        require(i + 1 < csv.length && csv.charAt(i + 1) == '\n',
          s"csv: bare CR at $i")
        endRow(); i += 1
      } else if (c == '\n') endRow() // tolerate bare LF line ends
      else {
        require(!fieldWasQuoted, s"csv: character after closing quote at $i")
        field.append(c)
        fieldStarted = true
      }
      i += 1
    }
    require(!inQuotes, "csv: unterminated quoted field at EOF")
    if (fieldStarted || nFields > 0) endRow() // final record without CRLF
    rows.result()
  }
}
