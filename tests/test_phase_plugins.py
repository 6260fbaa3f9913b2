"""Tabulated + Rayleigh phase functions in the volpath transport
(VERDICT round-1 item 6: real tabphase CDF sampling, reference
src/phase/tabphase.cpp; exact Rayleigh sampling, rayleigh.cpp).
Distribution correctness is chi2-tested in tests/test_chi2.py; here the
end-to-end transport dispatch."""

import numpy as np
import pytest

import mitsuba3dopplertof_tpu as mi


def _fog_scene(phase_xml, spp=256):
    return mi.load_string(f'''
<scene version="3.0.0">
  <integrator type="volpath"><integer name="max_depth" value="4"/></integrator>
  <sensor type="perspective"><float name="fov" value="45"/>
    <medium type="homogeneous" name="medium">
      <rgb name="sigma_t" value="0.6,0.6,0.6"/>
      <rgb name="albedo" value="0.9,0.9,0.9"/>
      {phase_xml}
    </medium>
    <film type="hdrfilm"><integer name="width" value="8"/>
      <integer name="height" value="8"/><rfilter type="box"/></film>
    <sampler type="independent"><integer name="sample_count" value="{spp}"/></sampler>
  </sensor>
  <shape type="rectangle">
    <transform name="to_world"><translate z="2"/></transform>
    <bsdf type="twosided"><bsdf type="diffuse">
      <rgb name="reflectance" value="0.7,0.7,0.7"/></bsdf></bsdf>
  </shape>
  <emitter type="point">
    <transform name="to_world"><translate z="1"/></transform>
    <rgb name="intensity" value="5"/>
  </emitter>
</scene>''')


def _mean(phase_xml, seed=0, spp=256):
    sc = _fog_scene(phase_xml, spp)
    img = np.asarray(mi.render(sc, seed=seed))
    assert np.isfinite(img).all()
    return img[..., :3].mean()


def test_constant_tabphase_equals_isotropic():
    """A constant table IS the isotropic phase — transport must agree."""
    m_iso = _mean('<phase type="isotropic"/>')
    m_tab = _mean('<phase type="tabphase">'
                  '<string name="values" value="1, 1, 1, 1, 1"/></phase>')
    assert m_iso > 0.01
    assert abs(m_tab - m_iso) / m_iso < 0.05, (m_tab, m_iso)


def test_forward_peaked_tabphase_acts_like_forward_hg():
    """A forward-peaked table behaves like a forward-peaked HG: brighter
    wall transmission than the backward-peaked mirror of the same table."""
    fwd = _mean('<phase type="tabphase">'
                '<string name="values" value="0.05, 0.1, 0.3, 1.0, 3.0"/>'
                '</phase>')
    bwd = _mean('<phase type="tabphase">'
                '<string name="values" value="3.0, 1.0, 0.3, 0.1, 0.05"/>'
                '</phase>')
    assert fwd > bwd * 1.05, (fwd, bwd)


def test_rayleigh_transport_matches_scale():
    """Rayleigh scattering is symmetric: total scattered energy sits
    between the iso baseline bounds and stays finite."""
    m_iso = _mean('<phase type="isotropic"/>')
    m_ray = _mean('<phase type="rayleigh"/>')
    assert m_ray > 0.01
    assert 0.7 < m_ray / m_iso < 1.4, (m_ray, m_iso)


def test_tabphase_rejects_bad_values():
    with pytest.raises(Exception):
        mi.load_string('''<scene version="3.0.0">
          <sensor type="perspective"><float name="fov" value="45"/>
            <medium type="homogeneous" name="medium">
              <phase type="tabphase">
                <string name="values" value="-1, 2"/></phase>
            </medium>
            <film type="hdrfilm"><integer name="width" value="4"/>
              <integer name="height" value="4"/></film>
            <sampler type="independent"/>
          </sensor>
        </scene>''')
