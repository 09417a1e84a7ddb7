package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** VRL `parse_etld(value[, plus_parts])` (vrl stdlib; the reference's
  * embedded VRL runtime resolves effective TLDs against the public
  * suffix list). Returns the VRL struct `{etld, etld_plus, known_suffix}`.
  *
  * The rule set is an EMBEDDED SNAPSHOT SUBSET of the public suffix list
  * (publicsuffix.org/list, mid-2025 edition): every rule form the PSL
  * algorithm defines — exact, wildcard (`*.ck`), exception (`!www.ck`) —
  * with ~400 entries covering the ICANN TLDs and multi-label registry
  * suffixes that dominate crawl/log traffic, plus the highest-traffic
  * private-section suffixes (blogspot.com, github.io, amazonaws.com
  * s3 buckets, …). A domain whose TLD is outside the snapshot falls to
  * the PSL's own default `*` rule — last label is the suffix,
  * `known_suffix = false` — which is exactly how the full list treats
  * unlisted TLDs, so the subset degrades gracefully rather than wrongly.
  *
  * Fallible like VRL's: an empty/invalid host, or `plus_parts` asking
  * for more labels than the domain has, throws — `??` / `, err =` catch.
  * `plus_parts` is validated at BUILD time (integer literal).
  */
case class VrlParseEtld(child: Expression, plusParts: Int)
    extends UnaryExpression {
  override def dataType: DataType = VrlParseEtld.Schema

  override protected def nullSafeEval(v: Any): Any =
    VrlParseEtld.parse(v.asInstanceOf[UTF8String], plusParts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VrlParseEtld.parse($v, $plusParts);")

  override protected def withNewChildInternal(newChild: Expression): VrlParseEtld =
    copy(child = newChild)
}

object VrlParseEtld {
  val Schema: StructType = StructType(Seq(
    StructField("etld", StringType, nullable = false),
    StructField("etld_plus", StringType, nullable = false),
    StructField("known_suffix", BooleanType, nullable = false)))

  /** publicsuffix.org snapshot subset (see class doc). One rule per
    * token; `*.` prefix = wildcard rule, `!` prefix = exception rule. */
  private val Snapshot: String =
    // generic + sponsored TLDs and the high-traffic new gTLDs
    """com net org edu gov mil int info biz name mobi pro aero asia cat
      coop jobs museum post tel travel xxx app dev io ai co me tv cc ly
      to gg sh fm am is id su xyz online site top club shop icu vip work
      live blog cloud store tech fun space website press news agency
      digital media studio design email group life world today zone
      solutions services systems network expert tools center company
      academy training institute school education courses directory
      foundation church community social events productions photography
      gallery graphics partners ventures capital finance financial fund
      investments insure tax legal attorney lawyer credit loans money
      exchange market marketing sale deals discount promo gifts toys
      games play casino bet poker bingo fan fans football soccer golf
      tennis run fitness yoga care health healthcare clinic dental
      doctor hospital pharmacy science engineering software codes
      computer host hosting domains download link click page wiki help
      support chat video movie film music audio radio show theater art
      auction bid build builders construction contractors plumbing
      repair cleaning catering restaurant cafe bar pub pizza kitchen
      recipes farm garden flowers florist dog cat pet vet energy solar
      green eco earth land estate realty rentals lease apartments villas
      vacations travels tours flights cruises hotel hotels holiday city
      town place region international global one plus max pics photo
      photos camera watch jewelry diamonds gold silver style fashion
      clothing shoes boutique beauty skin hair salon spa makeup wedding
      events dating singles family baby kids mom dad men team win vin
      wang xin red blue pink black gratis free cheap best cool fyi wtf
      lol omg ninja guru expert rocks party pw rest bzh moe""" +
    // ccTLDs (plain single-label; multi-label registry rules below)
    """ ac ad ae af ag al ar at au aw az ba bb bd be bf bg bh bi bj bm
      bo br bs bt bw by bz ca cd cf cg ch ci cl cm cn cr cu cv cy cz de
      dj dk dm do dz ec ee eg es et eu fi fo fr ga gd ge gf gh gi gl gm
      gn gp gq gr gt gu gy hk hn hr ht hu ie il im in iq ir it je jo jp
      ke kg kn kp kr kw ky kz la lb lc li lk lr ls lt lu lv ma mc md mg
      mk ml mm mn mo mq mr ms mt mu mv mw mx my mz na nc ne nf ng ni nl
      no nr nu om pa pe pf pg ph pk pl pm pn pr ps pt py qa re ro rs ru
      rw sa sb sc sd se sg si sk sl sm sn so sr st sv sy sz tc td tf tg
      th tj tk tl tm tn tr tt tw tz ua ug uk us uy uz va vc ve vg vi vn
      vu wf ws ye yt za zm zw""" +
    // multi-label registry suffixes (the rules a naive last-label split
    // gets wrong — the reason the PSL exists)
    """ co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk
      nhs.uk police.uk
      com.au net.au org.au edu.au gov.au id.au asn.au
      co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp
      com.br net.br org.br gov.br edu.br art.br blog.br eco.br
      com.cn net.cn org.cn gov.cn edu.cn ac.cn
      co.in net.in org.in firm.in gen.in ind.in ac.in edu.in gov.in
      co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz
      maori.nz iwi.nz kiwi.nz
      co.za net.za org.za gov.za web.za ac.za edu.za
      com.mx org.mx gob.mx edu.mx net.mx
      com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar
      com.tr net.tr org.tr gov.tr edu.tr web.tr av.tr bbs.tr
      co.kr or.kr ne.kr go.kr re.kr pe.kr ac.kr ms.kr es.kr hs.kr
      com.tw net.tw org.tw gov.tw edu.tw idv.tw game.tw ebiz.tw
      com.hk net.hk org.hk gov.hk edu.hk idv.hk
      com.sg net.sg org.sg gov.sg edu.sg per.sg
      com.my net.my org.my gov.my edu.my mil.my
      co.th in.th ac.th go.th or.th net.th mi.th
      com.ph net.ph org.ph gov.ph edu.ph ngo.ph
      co.id or.id ac.id go.id web.id my.id biz.id sch.id net.id
      com.vn net.vn org.vn gov.vn edu.vn int.vn biz.vn info.vn
      com.sa net.sa org.sa gov.sa edu.sa med.sa pub.sa sch.sa
      co.il org.il net.il ac.il gov.il muni.il k12.il idf.il
      com.eg net.eg org.eg gov.eg edu.eg sci.eg eun.eg
      com.ng net.ng org.ng gov.ng edu.ng sch.ng mil.ng mobi.ng
      co.ke or.ke ne.ke go.ke ac.ke sc.ke info.ke mobi.ke me.ke
      com.gh org.gh gov.gh edu.gh mil.gh
      co.tz or.tz go.tz ac.tz ne.tz sc.tz hotel.tz info.tz me.tz
      com.pk net.pk org.pk gov.pk edu.pk fam.pk biz.pk web.pk gok.pk
      com.bd net.bd org.bd gov.bd edu.bd ac.bd mil.bd
      com.lk org.lk gov.lk edu.lk ac.lk net.lk sch.lk int.lk
      gov.it edu.it
      co.at or.at ac.at gv.at priv.at
      com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl wroc.pl
      krakow.pl poznan.pl gda.pl
      com.ru net.ru org.ru int.ru msk.ru spb.ru
      com.ua net.ua org.ua gov.ua edu.ua in.ua kiev.ua kyiv.ua
      lviv.ua odessa.ua kharkov.ua dp.ua
      com.es org.es nom.es gob.es edu.es
      com.pt org.pt gov.pt edu.pt net.pt publ.pt
      com.gr org.gr gov.gr edu.gr net.gr
      asso.fr nom.fr gouv.fr avocat.fr aeroport.fr
      co.hu org.hu info.hu priv.hu tm.hu 2000.hu
      com.ro org.ro nom.ro info.ro rec.ro store.ro tm.ro www.ro
      co.rs org.rs edu.rs in.rs gov.rs ac.rs
      com.bg org.bg
      co.cz
      com.cy org.cy net.cy gov.cy ac.cy biz.cy ltd.cy press.cy
      com.mt org.mt net.mt edu.mt gov.mt
      com.co net.co org.co edu.co gov.co nom.co mil.co
      com.pe net.pe org.pe gob.pe edu.pe nom.pe mil.pe
      com.cl gob.cl gov.cl mil.cl
      com.ec net.ec org.ec gob.ec edu.ec info.ec fin.ec med.ec pro.ec
      com.ve net.ve org.ve gob.ve edu.ve info.ve co.ve web.ve
      com.uy net.uy org.uy gub.uy edu.uy mil.uy
      com.py net.py org.py gov.py edu.py coop.py mil.py una.py
      com.bo net.bo org.bo gob.bo edu.bo web.bo tv.bo int.bo mil.bo
      com.do net.do org.do gob.do edu.do web.do art.do mil.do sld.do
      com.gt net.gt org.gt gob.gt edu.gt ind.gt mil.gt
      com.sv org.sv gob.sv edu.sv red.sv
      com.ni net.ni org.ni gob.ni edu.ni int.ni nom.ni mil.ni
      com.pa net.pa org.pa gob.pa edu.pa ing.pa abo.pa med.pa sld.pa
      co.cr fi.cr go.cr or.cr sa.cr ac.cr ed.cr
      com.pr net.pr org.pr gov.pr edu.pr isla.pr pro.pr biz.pr info.pr
      com.ae net.ae org.ae gov.ae ac.ae sch.ae mil.ae
      com.qa net.qa org.qa gov.qa edu.qa sch.qa mil.qa name.qa
      com.kw net.kw org.kw gov.kw edu.kw ind.kw emb.kw
      com.bh net.bh org.bh gov.bh edu.bh
      com.om net.om org.om gov.om edu.om co.om med.om museum.om pro.om
      com.jo net.jo org.jo gov.jo edu.jo sch.jo mil.jo name.jo
      com.lb net.lb org.lb gov.lb edu.lb
      com.sy net.sy org.sy gov.sy edu.sy mil.sy news.sy
      co.ir net.ir org.ir gov.ir ac.ir sch.ir id.ir
      com.iq net.iq org.iq gov.iq edu.iq mil.iq
      com.af net.af org.af gov.af edu.af
      com.kz org.kz edu.kz gov.kz mil.kz net.kz
      com.uz co.uz net.uz org.uz
      com.kg org.kg net.kg gov.kg mil.kg
      co.am com.am net.am north.am org.am radio.am
      com.ge net.ge org.ge gov.ge edu.ge mil.ge pvt.ge
      com.az net.az org.az gov.az edu.az int.az mil.az name.az pro.az
      com.by gov.by mil.by of.by
      com.mk org.mk net.mk edu.mk gov.mk inf.mk name.mk
      com.al net.al org.al edu.al gov.al mil.al
      com.ba org.ba net.ba edu.ba gov.ba mil.ba unsa.ba unbi.ba
      co.ba com.hr""" +
    // PSL wildcard + exception rules (the algorithm's special forms)
    """ *.ck !www.ck *.jm *.np *.kawasaki.jp *.kitakyushu.jp
      !city.kawasaki.jp !city.kitakyushu.jp""" +
    // high-traffic PRIVATE-section suffixes (the full list ships these;
    // crawls hit them constantly, so a subset without them would
    // misgroup millions of subdomains into one registrable domain)
    """ blogspot.com github.io gitlab.io herokuapp.com appspot.com
      amazonaws.com s3.amazonaws.com elb.amazonaws.com
      azurewebsites.net cloudfront.net cloudapp.net firebaseapp.com
      web.app netlify.app vercel.app pages.dev workers.dev glitch.me
      onrender.com fly.dev fastly.net edgekey.net akamaized.net
      wordpress.com wixsite.com squarespace.com weebly.com webflow.io
      readthedocs.io surge.sh neocities.org tumblr.com ngrok.io
      repl.co deno.dev"""

  private val (exactRules, wildcardRules, exceptionRules) = {
    val toks = Snapshot.split("\\s+").filter(_.nonEmpty)
    val ex = scala.collection.mutable.HashSet[String]()
    val wc = scala.collection.mutable.HashSet[String]()
    val xc = scala.collection.mutable.HashSet[String]()
    toks.foreach {
      case t if t.startsWith("!") => xc += t.substring(1)
      case t if t.startsWith("*.") => wc += t.substring(2)
      case t => ex += t
    }
    (ex.toSet, wc.toSet, xc.toSet)
  }

  def parse(value: UTF8String, plusParts: Int): InternalRow = {
    val host = value.toString.toLowerCase(java.util.Locale.ROOT)
      .stripSuffix(".")
    val labels = host.split('.')
    if (host.isEmpty || labels.exists(_.isEmpty))
      throw new IllegalArgumentException(
        s"parse_etld: `${value.toString}` is not a valid domain")
    // PSL algorithm: scan candidate suffixes longest-first; an exception
    // rule wins outright (suffix = candidate minus its first label),
    // else the first (longest) exact/wildcard hit; no hit → the default
    // `*` rule (last label, unknown suffix).
    var suffixLen = 1
    var known = false
    var i = 0
    var done = false
    while (i < labels.length && !done) {
      val cand = labels.drop(i).mkString(".")
      if (exceptionRules.contains(cand)) {
        suffixLen = labels.length - i - 1; known = true; done = true
      } else if (exactRules.contains(cand) ||
          (i + 1 < labels.length &&
            wildcardRules.contains(labels.drop(i + 1).mkString(".")))) {
        suffixLen = labels.length - i; known = true; done = true
      } else i += 1
    }
    val plusLen = suffixLen + plusParts
    if (plusLen > labels.length)
      throw new IllegalArgumentException(
        s"parse_etld: `$host` has ${labels.length} labels — cannot take " +
          s"plus_parts=$plusParts past its $suffixLen-label public suffix")
    val etld = labels.takeRight(suffixLen).mkString(".")
    val plus = labels.takeRight(plusLen).mkString(".")
    InternalRow(UTF8String.fromString(etld), UTF8String.fromString(plus), known)
  }
}
