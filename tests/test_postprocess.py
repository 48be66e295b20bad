"""Perl post-processing ports vs the original scripts."""

import shutil
import subprocess

import pytest

from metakssd_tpu.postprocess import poisson, cami

PERL = shutil.which("perl")
SRC = "/root/reference/src"

needs_perl = pytest.mark.skipif(PERL is None, reason="no perl")

COMPOSITE_TSV = [
    # qry ref shared_k avg avg9899 median max   (unique depths: no ties)
    "s1.fq\t17_Escherichia coli\t120\t4.5\t7.2\t4\t19\n",
    "s1.fq\t33_Bacillus subtilis\t40\t2.0\t3.9\t2\t9\n",
    "s1.fq\t44_Listeria spp\t5\t1.0\t1.2\t1\t3\n",     # below shkm thr
    "s2.fq\t33_Bacillus subtilis\t90\t3.0\t5.5\t3\t11\n",
    "s2.fq\t77_Vibrio x\t30\t1.5\t2.1\t1\t5\n",
]


@needs_perl
def test_poisson_port_matches_perl(tmp_path):
    inp = tmp_path / "comp.tsv"
    inp.write_text("".join(COMPOSITE_TSV))
    ref = subprocess.run(
        [PERL, f"{SRC}/possion.kssd2out.pl", str(inp), "6"],
        capture_output=True, text=True, check=True).stdout
    import io
    buf = io.StringIO()
    poisson.poisson_abundance(COMPOSITE_TSV, shkm_thr=6, out=buf)
    assert buf.getvalue() == ref


@needs_perl
def test_cami_port_matches_perl(tmp_path):
    # tiny taxonomy: root=1; 2=superkingdom; 10,11=phylum; 100,101=species
    nodes = ["2\tsuperkingdom\t1\tBacteria\n",
             "10\tphylum\t2\tProteobacteria\n",
             "11\tphylum\t2\tFirmicutes\n",
             "100\tspecies\t10\tEscherichia coli\n",
             "101\tspecies\t11\tBacillus subtilis\n",
             "102\tspecies\t11\tVibrio x\n"]
    psid_map = ["17\t100\n", "33\t101\n", "77\t102\n"]
    inp = tmp_path / "comp.tsv"
    inp.write_text("".join(COMPOSITE_TSV))
    nf = tmp_path / "nodes.tsv"
    nf.write_text("".join(nodes))
    pf = tmp_path / "psid.tsv"
    pf.write_text("".join(psid_map))
    ref = subprocess.run(
        [PERL, f"{SRC}/universal.kssdcomposite2taxonomy_profilefmt.pl",
         str(inp), str(pf), str(nf), "18", "1"],
        capture_output=True, text=True, check=True).stdout
    import io
    buf = io.StringIO()
    n2r, n2p, n2n = cami.load_nodes(str(nf))
    cami.composite_to_cami_profile(
        COMPOSITE_TSV, cami.load_psid_map(str(pf)), n2r, n2p, n2n,
        shkm_thr=18, low_thr=1, out=buf)

    # Perl emits samples in per-process-random hash order; compare the
    # per-sample blocks as a set.
    def blocks(text):
        out = {}
        for blk in text.split("# Taxonomic Profiling Output\n"):
            if blk.strip():
                sample = blk.split("\n", 1)[0]
                out[sample] = blk
        return out
    assert blocks(buf.getvalue()) == blocks(ref)


@needs_perl
def test_abv_match_metadata_matches_perl(tmp_path):
    abv = ["#Sample\tCosineXY\n",
           "SRR001.fastq.abv\t0.98\n",
           "SRR999.abv\t0.55\n"]
    meta = ["run,proj,sample,organism\n",
            "SRR001,PRJ1,SAMN1,Homo sapiens gut\n"]
    a = tmp_path / "a.tsv"
    a.write_text("".join(abv))
    m = tmp_path / "m.csv"
    m.write_text("".join(meta))
    ref = subprocess.run(
        [PERL, f"{SRC}/abv_match_metaData.pl", str(a), str(m)],
        capture_output=True, text=True, check=True).stdout
    import io
    buf = io.StringIO()
    cami.abv_match_metadata(abv, meta, out=buf)
    assert buf.getvalue() == ref


@needs_perl
def test_krona_taxonomy_matches_perl(tmp_path):
    psid = ["17_Escherichia coli\n", "33_Bacillus subtilis\n"]
    tax = ["d__Bacteria;p__Proteobacteria;c__Gamma;o__Ent;f__Entb;"
           "g__Escherichia;s__Escherichia coli\n",
           "d__Bacteria;p__Firmicutes;c__Bacilli;o__Bac;f__Bacil;"
           "g__Bacillus;s__Bacillus subtilis\n"]
    p = tmp_path / "p.list"
    p.write_text("".join(psid))
    t = tmp_path / "t.list"
    t.write_text("".join(tax))
    ref = subprocess.run(
        [PERL, f"{SRC}/gtdb_psid_species2krona_taxonomy.pl", str(p), str(t)],
        capture_output=True, text=True, check=True).stdout
    import io
    buf = io.StringIO()
    cami.krona_taxonomy(psid, tax, out=buf)
    assert buf.getvalue() == ref


@needs_perl
def test_csv_subset_matches_perl(tmp_path):
    import io
    from metakssd_tpu.postprocess import csvutil
    csv = ["id1,a,b\n", "id2,c,d\n", "id3,e,f\n", "id2,x,y\n"]
    sel = ["id2\tmeta\n", "id9\tzz\n", "id1\n"]
    csvf, self_ = tmp_path / "t.csv", tmp_path / "s.tsv"
    csvf.write_text("".join(csv))
    self_.write_text("".join(sel))
    ref = subprocess.run(
        [PERL, f"{SRC}/csv_table_subset.pl", str(csvf), str(self_)],
        capture_output=True, text=True, check=True).stdout
    buf = io.StringIO()
    csvutil.csv_table_subset(csv, sel, out=buf)
    assert buf.getvalue() == ref

    ref = subprocess.run(
        [PERL, f"{SRC}/ordcsv_table_subset.pl", str(csvf), str(self_)],
        capture_output=True, text=True, check=True).stdout
    buf = io.StringIO()
    csvutil.ordcsv_table_subset(csv, sel, out=buf)
    assert buf.getvalue() == ref
