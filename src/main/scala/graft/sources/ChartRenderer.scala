package graft.sources

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.geom.Arc2D
import java.awt.image.BufferedImage

/** Optional raster adapter for [[ChartSpec]] output — parity with the
  * reference's on-disk PNGs (plots.py:21-141) without linking a plotting
  * library into the engine core: queries emit Vega-Lite specs (golden-
  * testable JSON); THIS adapter turns a spec into pixels with nothing
  * but headless AWT + ImageIO, both part of the JVM. Callers that have
  * a real Vega toolchain should prefer it; this exists so the demo can
  * write the notebook's plot files fully offline.
  */
trait ChartRenderer {
  /** Rasterize a ChartSpec JSON string to a PNG file. */
  def render(spec: String, pngPath: String): Unit
}

/** Pure-JVM renderer for the exact spec subset [[ChartSpec]] emits:
  * `mark: bar` (x nominal, y quantitative) and `mark: arc` (theta
  * quantitative, color nominal). Visual conventions follow the
  * reference's matplotlib output: C0-blue bars, tab10 pie palette,
  * rotated x labels, title on top (plots.py:49-56, 90-96).
  */
object AwtChartRenderer extends ChartRenderer {

  private val BarW = 1000
  private val BarH = 500
  private val PieW = 640
  private val PieH = 640

  /** matplotlib C0. */
  private val BarColor = new Color(0x1f, 0x77, 0xb4)
  /** matplotlib tab10. */
  private val Palette: Array[Color] = Array(
    new Color(0x1f, 0x77, 0xb4), new Color(0xff, 0x7f, 0x0e),
    new Color(0x2c, 0xa0, 0x2c), new Color(0xd6, 0x27, 0x28),
    new Color(0x94, 0x67, 0xbd), new Color(0x8c, 0x56, 0x4b),
    new Color(0xe3, 0x77, 0xc2), new Color(0x7f, 0x7f, 0x7f),
    new Color(0xbc, 0xbd, 0x22), new Color(0x17, 0xbe, 0xcf))

  override def render(spec: String, pngPath: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(spec)
    val title = (j \ "title") match { case JString(s) => s; case _ => "" }
    val mark = (j \ "mark" \ "type") match { case JString(s) => s; case _ => "bar" }
    val rows: Seq[Map[String, JValue]] = (j \ "data" \ "values") match {
      case JArray(vs) => vs.collect { case JObject(fs) => fs.toMap }
      case _ => Nil
    }
    def field(path: String*): String =
      path.foldLeft(j \ "encoding")((a, p) => a \ p) match {
        case JString(s) => s; case _ => ""
      }
    def num(v: JValue): Double = v match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case _ => 0.0
    }
    def str(v: JValue): String = v match {
      case JString(s) => s; case JNothing | JNull => ""; case other => JsonMethods.compact(JsonMethods.render(other))
    }
    val img = mark match {
      case "arc" =>
        val cat = field("color", "field")
        val theta = field("theta", "field")
        drawPie(title, rows.map(r => (str(r.getOrElse(cat, JNull)), num(r.getOrElse(theta, JNull)))))
      case _ =>
        val xf = field("x", "field")
        val yf = field("y", "field")
        drawBar(title, rows.map(r => (str(r.getOrElse(xf, JNull)), num(r.getOrElse(yf, JNull)))))
    }
    val p = java.nio.file.Paths.get(pngPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    javax.imageio.ImageIO.write(img, "png", p.toFile)
    ()
  }

  private def antialiased(g: Graphics2D): Unit = {
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
    g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
  }

  /** 1-2-5 nice ceiling for the y axis (matplotlib's locator family). */
  private[sources] def niceMax(v: Double): Double = {
    if (v <= 0) return 1.0
    val exp = math.floor(math.log10(v))
    val base = math.pow(10, exp)
    val m = v / base
    val nice = if (m <= 1.0) 1.0 else if (m <= 2.0) 2.0 else if (m <= 5.0) 5.0 else 10.0
    nice * base
  }

  private def drawBar(title: String, data: Seq[(String, Double)]): BufferedImage = {
    val img = new BufferedImage(BarW, BarH, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    antialiased(g)
    g.setColor(Color.WHITE); g.fillRect(0, 0, BarW, BarH)
    val (left, right, top, bottom) = (80, 30, 50, 110)
    val plotW = BarW - left - right
    val plotH = BarH - top - bottom
    // title
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 18))
    val tw = g.getFontMetrics.stringWidth(title)
    g.drawString(title, (BarW - tw) / 2, 30)
    // axes
    g.setStroke(new BasicStroke(1.5f))
    g.drawLine(left, top, left, top + plotH)
    g.drawLine(left, top + plotH, left + plotW, top + plotH)
    val yMax = niceMax(data.map(_._2).foldLeft(0.0)(math.max))
    // y ticks + gridlines
    g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
    (0 to 5).foreach { i =>
      val v = yMax * i / 5
      val y = top + plotH - (plotH * i / 5)
      g.setColor(new Color(0xdd, 0xdd, 0xdd))
      if (i > 0) g.drawLine(left + 1, y, left + plotW, y)
      g.setColor(Color.BLACK)
      g.drawLine(left - 4, y, left, y)
      val label = if (yMax <= 1.0) f"$v%.2f" else if (yMax < 10) f"$v%.1f" else f"$v%.0f"
      g.drawString(label, left - 10 - g.getFontMetrics.stringWidth(label), y + 4)
    }
    if (data.nonEmpty) {
      // bars: matplotlib default width 0.8 of the slot
      val slot = plotW.toDouble / data.size
      val barW = math.max(1.0, slot * 0.8)
      data.zipWithIndex.foreach { case ((label, v), i) =>
        val h = if (yMax == 0) 0 else (plotH * (v / yMax)).toInt
        val x = left + (slot * i + (slot - barW) / 2).toInt
        g.setColor(BarColor)
        g.fillRect(x, top + plotH - h, barW.toInt, h)
        // rotated x label, anchored at the bar center (ha="right",
        // rotation=45 in plots.py:53)
        g.setColor(Color.BLACK)
        val cx = left + slot * i + slot / 2
        val old = g.getTransform
        g.rotate(-math.Pi / 4, cx, top + plotH + 16)
        g.drawString(label,
          (cx - g.getFontMetrics.stringWidth(label)).toInt, (top + plotH + 16).toInt)
        g.setTransform(old)
      }
    }
    g.dispose()
    img
  }

  private def drawPie(title: String, data: Seq[(String, Double)]): BufferedImage = {
    val img = new BufferedImage(PieW, PieH, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    antialiased(g)
    g.setColor(Color.WHITE); g.fillRect(0, 0, PieW, PieH)
    g.setColor(Color.BLACK)
    g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 18))
    val tw = g.getFontMetrics.stringWidth(title)
    g.drawString(title, (PieW - tw) / 2, 30)
    val total = data.map(_._2).sum
    if (total > 0) {
      val cx = PieW / 2.0
      val cy = PieH / 2.0 + 10
      val r = math.min(PieW, PieH) / 2.0 - 90
      var start = 90.0 // matplotlib starts at 3 o'clock; ours at 12 — cosmetic
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 13))
      data.zipWithIndex.foreach { case ((label, v), i) =>
        val extent = -360.0 * v / total // clockwise
        g.setColor(Palette(i % Palette.length))
        g.fill(new Arc2D.Double(cx - r, cy - r, 2 * r, 2 * r, start, extent, Arc2D.PIE))
        // label outside, autopct inside (plots.py:91 autopct="%1.1f%%")
        val mid = math.toRadians(start + extent / 2)
        val (dx, dy) = (math.cos(mid), -math.sin(mid))
        g.setColor(Color.BLACK)
        val name = label
        val lx = cx + dx * (r + 14)
        val ly = cy + dy * (r + 14)
        val nw = g.getFontMetrics.stringWidth(name)
        g.drawString(name, (if (dx < -0.1) lx - nw else if (dx <= 0.1) lx - nw / 2.0 else lx).toFloat, ly.toFloat + 4)
        val pct = f"${100.0 * v / total}%1.1f%%"
        g.setColor(Color.WHITE)
        val pw = g.getFontMetrics.stringWidth(pct)
        g.drawString(pct, (cx + dx * r * 0.6 - pw / 2.0).toFloat, (cy + dy * r * 0.6).toFloat + 4)
        start += extent
      }
    }
    g.dispose()
    img
  }
}
